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
from australian_company_etl_spark.sources.registry import load_tables, table_path

COUNT_TABLES = ["customer", "orders", "lineitem", "documents"]

SMALL_FILE_BYTES = 128 * 1024 * 1024  # files below one HDFS-ish block are "small"


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


def quality_table_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — table-maintenance health report: the Spark analog of the
    reference's VACUUM/index verification (run_quality_checks.py:37-116).
    Postgres bloat/index health maps to file-layout health on a data lake:
    per table — file count, total/min/max file bytes, small-file count (the
    classic 100 TB scan killer), plus data-side row count and scan-partition
    skew (floor(100·max/avg rows per input split)).

    File stats come from the filesystem listing: catalog/FS metadata,
    driver-side by design — every table-maintenance tool (OPTIMIZE, VACUUM)
    starts from the file manifest, not a data scan. Row and partition stats
    are computed distributed (one tiny groupBy per table over
    spark_partition_id). No DuckDB twin: file-layout metadata is invisible
    to the oracle's table views, so the driver records the rows-only check;
    tests/test_operators.py checks the numbers against os.stat ground truth.
    """
    import os

    file_rows = []
    for name in COUNT_TABLES:
        p = table_path(sf_dir, name)
        if os.path.isdir(p):
            paths = [
                os.path.join(root, f)
                for root, _, files in os.walk(p)
                for f in files
                if f.endswith(".parquet")
            ]
        else:
            paths = [p]
        sizes = [os.stat(f).st_size for f in paths]
        file_rows.append(
            (
                name,
                len(sizes),
                sum(sizes),
                min(sizes),
                max(sizes),
                sum(1 for s in sizes if s < SMALL_FILE_BYTES),
            )
        )
    meta = spark.createDataFrame(
        file_rows,
        "table_name string, n_files long, total_bytes long, "
        "min_file_bytes long, max_file_bytes long, small_files long",
    ).select(
        "table_name",
        F.expr(
            "stack(5,"
            " 'n_files', n_files,"
            " 'total_bytes', total_bytes,"
            " 'min_file_bytes', min_file_bytes,"
            " 'max_file_bytes', max_file_bytes,"
            " 'small_files', small_files) AS (metric, value)"
        ),
    )

    t = load_tables(spark, sf_dir, COUNT_TABLES)
    data_parts = []
    for name in COUNT_TABLES:
        per_part = (
            t[name]
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .agg(F.count("*").alias("c"))
            .agg(
                F.sum("c").alias("n_rows"),
                F.count("*").alias("n_scan_partitions"),
                F.max("c").alias("max_partition_rows"),
            )
            .withColumn("table_name", F.lit(name))
            .withColumn(
                "skew_pct",
                F.floor(
                    100 * F.col("max_partition_rows") * F.col("n_scan_partitions")
                    / F.col("n_rows")
                ),
            )
        )
        data_parts.append(
            per_part.select(
                "table_name",
                F.expr(
                    "stack(4,"
                    " 'n_rows', n_rows,"
                    " 'n_scan_partitions', CAST(n_scan_partitions AS BIGINT),"
                    " 'max_partition_rows', max_partition_rows,"
                    " 'skew_pct', skew_pct) AS (metric, value)"
                ),
            )
        )
    out = meta
    for d in data_parts:
        out = out.unionByName(d)
    return out.select(
        "table_name", "metric", F.col("value").cast("bigint").alias("value")
    ).orderBy("table_name", "metric")


QUERIES = {
    "quality_row_counts": quality_row_counts,
    "quality_table_health": quality_table_health,
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
