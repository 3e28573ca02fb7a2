"""Empty-input parity sweep — the zero-row regime the main gate never sees.

At 100 TB, zero-row inputs are routine (an empty landed batch, an empty
day partition, a filter that matches nothing), and aggregate semantics
diverge between engines exactly there: sum() over zero rows is NULL while
count() is 0, and Spark's Expand-based rollup/cube/groupingSets yield
ZERO rows on empty input where the SQL standard (and DuckDB) treat the
() grouping set as a global aggregate — one row. The round-8 sweep that
introduced this module found six gate-blind divergences: a one-sided
round-7 empty-table fix (Spark coalesced to 0, the oracle still returned
NULL), sum(when)-over-empty NULLs in the constraint and DAG reports, and
the three grouping-sets plans dropping the grand-total row.

This test runs EVERY sql-gated registry query against an all-empty
corpus (same schemas, zero rows) and compares Spark vs the DuckDB oracle
with the driver's comparison — so the empty regime stays green by
construction from now on.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_compare import compare, duckdb_connect

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    from australian_company_etl_spark.sources.registry import (
        TABLES,
        load_tables,
        table_path,
    )

    out = str(tmp_path_factory.mktemp("empty_corpus"))
    for t in TABLES:
        df = load_tables(spark, sf_dir, [t])[t]
        df.limit(0).coalesce(1).write.parquet(table_path(out, t))
    return out


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duckdb_connect(empty_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n in ORACLES))
def test_query_matches_oracle_on_empty_corpus(name, spark, empty_dir, empty_con):
    res = compare(QUERIES[name](spark, empty_dir), empty_con, ORACLES[name])
    assert res["ok"], {k: v for k, v in res.items() if k != "spark_cols"}
