"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's gate: row count, schema (column names sorted), and a
value hash computed on column-name-sorted, row-sorted stringified values.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from australian_company_etl_spark.sources.registry import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):  # Spark-written table = directory of parts
            # recursive glob + hive_partitioning so partitionBy layouts
            # (key=value subdirectories) read back with their key columns;
            # both are no-ops for a flat directory of part files
            path = os.path.join(path, "**", "*.parquet")
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{path}', hive_partitioning = true)"
            )
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v: Any) -> str:
    if v is None:
        return "∅"
    # As strict as the driver's hash: an integral float ("9707.0") does NOT
    # equal an int ("9707") — DuckDB HUGEINT sums fetch as float, so oracle
    # SQL must CAST(sum(...) AS BIGINT) to match Spark's BIGINT output.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    result = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    result["cols_match"] = result["spark_cols"] == result["duck_cols"]
    result["count_match"] = len(s_rows) == len(d_rows)
    if result["cols_match"]:
        sc = canonical_rows(s_cols, s_rows)
        dc = canonical_rows(d_cols, d_rows)
        result["values_match"] = sc == dc
        if not result["values_match"]:
            diff_s = [r for r in sc if r not in set(dc)][:5]
            diff_d = [r for r in dc if r not in set(sc)][:5]
            result["spark_only"] = diff_s
            result["duck_only"] = diff_d
    else:
        result["values_match"] = False
    result["ok"] = result["cols_match"] and result["count_match"] and result["values_match"]
    return result
