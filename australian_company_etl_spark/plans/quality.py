"""Group C — data-quality checks (reference t4, scripts/run_quality_checks.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from australian_company_etl_spark.operators.quality import (
    duplicate_keys,
    null_empty_counts,
    row_counts,
    value_distribution,
)
from australian_company_etl_spark.sources.registry import load_tables

COUNT_TABLES = ["customer", "orders", "lineitem", "documents"]


def quality_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — per-table row counts (run_quality_checks.py:46-52)."""
    return row_counts(load_tables(spark, sf_dir, COUNT_TABLES))


ROW_COUNTS_SQL = """
SELECT 'customer' AS table_name, count(*) AS n_rows FROM customer
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'documents', count(*) FROM documents
"""


def quality_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — NULL/empty counts on critical columns (run_quality_checks.py:54-62)."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "documents"])
    return null_empty_counts(
        [
            ("customer", t["customer"], "c_name"),
            ("orders", t["orders"], "o_orderstatus"),
            ("documents", t["documents"], "text"),
            ("documents", t["documents"], "lang"),
        ]
    )


NULL_COUNTS_SQL = """
SELECT 'customer' AS table_name, 'c_name' AS column_name,
       sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       sum(CASE WHEN c_name IS NOT NULL AND trim(c_name) = '' THEN 1 ELSE 0 END)::BIGINT AS n_empty
FROM customer
UNION ALL
SELECT 'orders', 'o_orderstatus',
       sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
       sum(CASE WHEN o_orderstatus IS NOT NULL AND trim(o_orderstatus) = '' THEN 1 ELSE 0 END)::BIGINT
FROM orders
UNION ALL
SELECT 'documents', 'text',
       sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT,
       sum(CASE WHEN text IS NOT NULL AND trim(text) = '' THEN 1 ELSE 0 END)::BIGINT
FROM documents
UNION ALL
SELECT 'documents', 'lang',
       sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT,
       sum(CASE WHEN lang IS NOT NULL AND trim(lang) = '' THEN 1 ELSE 0 END)::BIGINT
FROM documents
"""


def quality_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — duplicate-key detection (≈ dup ABNs, run_quality_checks.py:81-98)."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    return duplicate_keys(orders, "o_custkey")


DUP_KEYS_SQL = """
SELECT o_custkey, count(*) AS n
FROM orders GROUP BY o_custkey HAVING count(*) > 1
"""


def quality_conf_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — value-distribution group-by (≈ merged_confidence histogram,
    run_quality_checks.py:64-78) over event values bucketed by 10."""
    events = load_tables(spark, sf_dir, ["events"])["events"]
    bucket = (F.floor(F.col("value") / 10) * 10).cast("int")
    return value_distribution(events, bucket, "value_bucket").orderBy("value_bucket")


CONF_DIST_SQL = """
SELECT (floor(value / 10) * 10)::INT AS value_bucket, count(*) AS n
FROM events GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "quality_row_counts": quality_row_counts,
    "quality_null_counts": quality_null_counts,
    "quality_dup_keys": quality_dup_keys,
    "quality_conf_distribution": quality_conf_distribution,
}

ORACLES = {
    "quality_row_counts": ROW_COUNTS_SQL,
    "quality_null_counts": NULL_COUNTS_SQL,
    "quality_dup_keys": DUP_KEYS_SQL,
    "quality_conf_distribution": CONF_DIST_SQL,
}
