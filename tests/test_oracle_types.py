"""Oracle output-type lint: make the HUGEINT bug class unrepresentable.

The driver fetches DuckDB oracle results through a path that renders
HUGEINT (and can render DECIMAL) as float — so an oracle column typed
HUGEINT hash-mismatches Spark's BIGINT even when every value is equal.
This bit both rounds 1 and 2 (extract_json_props / q12, then
events_sessionize / pivot_user_event_matrix). The local gate's
``fetchall()`` converts HUGEINT to Python int, which is why the repo's
own parity tests could not see it.

This test closes the class structurally: DuckDB ``DESCRIBE`` over every
registered oracle (no Spark session needed, runs in seconds) and fail on
any output column typed HUGEINT or DECIMAL. DuckDB types SUM(INTEGER)
and SUM(BIGINT) as HUGEINT, and integer division/round paths can produce
DECIMAL — oracles must ``CAST(... AS BIGINT)`` / ``AS DOUBLE`` so the
wire type matches the Spark twin exactly.
"""

from __future__ import annotations

import pytest

from australian_company_etl_spark.plans import all_oracles
from tests.conftest import SF_DIR
from tests.oracle_compare import duckdb_connect

FORBIDDEN = ("HUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_oracle_emits_no_hugeint_or_decimal(con, name):
    sql = all_oracles()[name]
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in rows
        if any(f in typ.upper() for f in FORBIDDEN)
    ]
    assert not offenders, (
        f"oracle {name!r} emits driver-unsafe column types {offenders}; "
        f"CAST the expression (AS BIGINT / AS DOUBLE) in the oracle SQL so "
        f"its wire type matches the Spark twin"
    )
