"""Parquet source registry for the test corpus.

One parquet file per table (TPC-H-ish star schema + events/documents/
embeddings). At 100 TB each "table" would be a partitioned parquet dataset —
`spark.read.parquet(dir)` is identical either way; filters/projections push
down to the scan and partition pruning applies when the layout is
`.../table/dt=.../part-*.parquet`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    # defensive: plans may receive an externally-built SparkSession (the
    # driver contract passes one in). events.parquet has carried either
    # TIMESTAMP(NANOS) (needs nanosAsLong or Spark refuses the file) or
    # naive TIMESTAMP(MICROS) (Spark 4 would infer TIMESTAMP_NTZ, which
    # unix_micros/window reject or treat differently — read it as a UTC
    # instant instead, exactly how DuckDB surfaces the same bytes under a
    # UTC session). Timestamp-formatting plans assume a UTC session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    # `is None` test, NOT truthiness: an explicitly-empty list means "load
    # nothing", not "load all ten tables"
    for n in TABLES if names is None else names:
        df = spark.read.parquet(table_path(sf_dir, n))
        ts_type = dict(df.dtypes).get("ts")
        if n == "events" and ts_type == "bigint":
            # TIMESTAMP(NANOS) read as epoch-nanos long (see session.py);
            # truncate to micros — same precision DuckDB surfaces.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif n == "events" and ts_type == "timestamp_ntz":
            # reader built before the conf landed (cached session state)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        out[n] = df
    return out


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
