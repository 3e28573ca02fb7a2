"""Group K — end-to-end corpus curation: the composed training-data pipeline.

`curate_corpus` chains the H2 quality score with F2 minhash near-dup
detection the way a production pretraining-data pipeline does:

    score docs → drop low-quality → drop the younger half of each
    strong near-dup pair (Jaccard ≥ 0.5) → emit the kept corpus

This is the Spark-first analog of the reference's full DAG (extract →
match → quality-gate → publish, airflow/dags/*): one declarative plan,
no intermediate tables, each stage's filter pushed as far down as
Catalyst allows.

Scale: quality scoring is scan-bound codegen; the dedup pair list is tiny
relative to the corpus, so the kill-list anti-join broadcasts. At 100 TB
the minhash stages dominate — see plans/dedup.py for their shuffle story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from australian_company_etl_spark.plans.dedup import _minhash_sql, dedup_minhash_lsh
from australian_company_etl_spark.plans.text import _quality_sql, text_quality_score

QUALITY_T = 0.35
STRONG_DUP_T = 0.5


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 — quality-gate + near-dup-drop; returns the kept corpus."""
    qual = text_quality_score(spark, sf_dir).filter(F.col("quality") >= QUALITY_T)
    kill = (
        dedup_minhash_lsh(spark, sf_dir)
        .filter(F.col("jaccard") >= STRONG_DUP_T)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
    )
    return qual.join(F.broadcast(kill), "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "quality"
    )


def _curate_sql() -> str:
    return f"""
WITH qual AS (SELECT * FROM ({_quality_sql()}) q WHERE quality >= {QUALITY_T}),
kill AS (SELECT DISTINCT doc_id_b AS doc_id FROM ({_minhash_sql()}) p
         WHERE jaccard >= {STRONG_DUP_T})
SELECT doc_id, n_tokens, quality
FROM qual
WHERE doc_id NOT IN (SELECT doc_id FROM kill)
"""


QUERIES = {"curate_corpus": curate_corpus}
ORACLES = {"curate_corpus": _curate_sql()}
