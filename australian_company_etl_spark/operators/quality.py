"""Data-quality operators (reference parity: scripts/run_quality_checks.py).

The reference runs psql-side checks (row counts, NULL counts on critical
columns, duplicate ABNs, confidence distribution). Here each check is a
DataFrame op; counts are map-side-combined aggregations (one shuffle of
pre-aggregated partials — scale-safe).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_counts(dfs: dict[str, DataFrame]) -> DataFrame:
    """Per-table row counts (run_quality_checks.py:46-52)."""
    parts = [
        df.agg(F.count("*").alias("n_rows")).select(F.lit(name).alias("table_name"), "n_rows")
        for name, df in dfs.items()
    ]
    return reduce(DataFrame.unionAll, parts)


def null_empty_counts(named: list[tuple[str, DataFrame, str]]) -> DataFrame:
    """(table, column) → NULL count + empty-after-trim count
    (run_quality_checks.py:54-62)."""
    parts = []
    for table, df, col in named:
        parts.append(
            df.agg(
                # coalesce: sum() over ZERO rows is NULL, and an empty table
                # (a zero-row landed batch) must report 0 like the psql
                # reference check, not a NULL that falsifies `n_null == 0`
                F.coalesce(
                    F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)), F.lit(0)
                ).alias("n_null"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(col).isNotNull()
                            & (F.trim(F.col(col).cast("string")) == ""),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("n_empty"),
            ).select(
                F.lit(table).alias("table_name"),
                F.lit(col).alias("column_name"),
                F.col("n_null").cast("bigint").alias("n_null"),
                F.col("n_empty").cast("bigint").alias("n_empty"),
            )
        )
    return reduce(DataFrame.unionAll, parts)


def duplicate_keys(df: DataFrame, key_col: str) -> DataFrame:
    """Keys occurring more than once (run_quality_checks.py:81-98)."""
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def value_distribution(df: DataFrame, bucket_col, alias: str) -> DataFrame:
    """Value distribution group-by (run_quality_checks.py:64-78)."""
    return df.groupBy(bucket_col.alias(alias)).agg(F.count("*").alias("n"))
