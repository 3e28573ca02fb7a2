"""NULL-heavy-input parity sweep — optional columns NULLed on half the rows.

The gate corpora carry no NULLs in text/lang/name columns, so NULL
handling that differs between the engines is invisible there — the class
the round-8 min_by NULLS-LAST fix belongs to. This sweep NULLs the
optional string columns (documents.text/lang, customer.c_name,
supplier.s_name, part.p_name) on every ODD key — the F.when(key % 2 == 0)
below KEEPS even-key values and NULLs the rest (a round-8 review caught
this docstring saying the opposite) — and runs EVERY sql-gated registry
query Spark-vs-oracle. The introducing sweep found two real
divergences (out of 151): text_fingerprint folded NULL text into the
md5('') fingerprint via concat_ws while the oracle propagated NULL
(every content-less doc would dedup against empty docs), and the audio
features oracle's n_samples column was missing the NULL-coalesce its
sibling columns carry. Keys and numeric fact columns stay non-null —
they are non-null by schema contract in the reference's own data model.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.oracle_compare import compare, duckdb_connect

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

#: table → [(nullable column, key column used to pick the NULLed half)]
NULL_COLS = {
    "documents": [("text", "doc_id"), ("lang", "doc_id")],
    "customer": [("c_name", "c_custkey")],
    "supplier": [("s_name", "s_suppkey")],
    "part": [("p_name", "p_partkey")],
}


@pytest.fixture(scope="module")
def nullheavy_dir(spark, sf_dir, tmp_path_factory):
    from australian_company_etl_spark.sources.registry import (
        TABLES,
        load_tables,
        table_path,
    )

    out = str(tmp_path_factory.mktemp("nullheavy_corpus"))
    for t in TABLES:
        df = load_tables(spark, sf_dir, [t])[t]
        for col, key in NULL_COLS.get(t, []):
            df = df.withColumn(col, F.when(F.col(key) % 2 == 0, F.col(col)))
        df.coalesce(1).write.parquet(table_path(out, t))
    return out


@pytest.fixture(scope="module")
def nullheavy_con(nullheavy_dir):
    con = duckdb_connect(nullheavy_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n in ORACLES))
def test_query_matches_oracle_on_nullheavy_corpus(
    name, spark, nullheavy_dir, nullheavy_con
):
    res = compare(QUERIES[name](spark, nullheavy_dir), nullheavy_con, ORACLES[name])
    assert res["ok"], {k: v for k, v in res.items() if k != "spark_cols"}
