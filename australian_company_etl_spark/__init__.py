"""PySpark-native analytics/ETL engine with the capabilities of the
reference `australian-company-etl` pipeline (Common Crawl + ABR extract,
entity matching, quality checks, query API), re-expressed Spark-first and
extended with LLM-training-data operators (dedup, similarity search,
multimodal columns, text analysis).

Everything is declarative DataFrame/SQL — Catalyst picks physical plans;
operators are designed for 100 TB / multi-executor scale (blocking instead
of cartesian joins, broadcast dims, AQE) even though tests run on local[*].
"""

from australian_company_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
