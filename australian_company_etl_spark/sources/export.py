"""Sink connectors — full-table export (reference parity: dump_db.py).

The reference dumps the unified Postgres table to one CSV with a psycopg2
cursor loop. Spark-first: `DataFrame.write` with an explicit format —
distributed, restartable, and partitionable. `single_file=True` reproduces
the reference's one-file contract (coalesce(1) — driver-light, but the
write itself is still an executor task); at 100 TB you never do that, you
write partitioned parquet/csv and let the consumer glob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def export_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def export_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
