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


# ── rendering-class cross-check against the Spark twin ──────────────────────
# The driver hashes STRINGIFIED values, so a (spark, duckdb) column-type
# pair is safe iff both sides render identically: any integer width pairs
# with any integer width ("5" == "5"), but DOUBLE must pair with double
# (a float32 reprs differently from a float64, an int differently from a
# float, a timestamp differently from a date). This test plans every Spark
# twin (no execution) and checks each oracle output column's type pairs
# into the same rendering class — so ANY future type drift, not just
# HUGEINT, fails here before it can fail at the driver.

_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
_INT_DUCK = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _render_compatible(spark_t: str, duck_t: str) -> bool:
    spark_t, duck_t = spark_t.strip(), duck_t.strip()
    if spark_t.startswith("array<") and duck_t.endswith("[]"):
        return _render_compatible(spark_t[6:-1], duck_t[:-2])
    if spark_t in _INT_SPARK:
        return duck_t in _INT_DUCK
    return {
        "double": duck_t == "DOUBLE",
        "float": duck_t == "FLOAT",
        "string": duck_t == "VARCHAR",
        "boolean": duck_t == "BOOLEAN",
        "date": duck_t == "DATE",
        # TIMESTAMPTZ is NOT render-compatible: DuckDB stringifies it with a
        # "+00" offset suffix that Spark's timestamp rendering never emits,
        # so it would pass locally and hash-mismatch at the driver
        "timestamp": duck_t == "TIMESTAMP",
        "binary": duck_t == "BLOB",
    }.get(spark_t, False)


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_oracle_types_match_spark_twin_rendering(con, name, spark):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, SF_DIR)
    stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    mismatches = []
    for col, typ, *_ in con.execute(f"DESCRIBE ({all_oracles()[name]})").fetchall():
        if col not in stypes:
            mismatches.append((col, "MISSING-IN-SPARK", typ))
        elif not _render_compatible(stypes[col], typ):
            mismatches.append((col, stypes[col], typ))
    assert not mismatches, (
        f"oracle {name!r} column types drift from the Spark twin's rendering "
        f"class {mismatches}; cast one side so stringified values agree"
    )


# ── driver-canonicalizer contract: no nested output columns ────────────────
# The driver canonicalizes results with pandas (sort_values over every
# column, then value-hash); a list/dict cell raises "unhashable type" and
# the whole row goes red regardless of semantic correctness — this killed
# text_inverted_index's r03 row (ARRAY<BIGINT> postings). Close the class
# structurally, as the HUGEINT lint above did for oracle types: every
# registry query's Spark output schema must be flat scalars. Emit a
# canonical joined string (array_join(sort_array(...), ",") ↔
# string_agg(... ORDER BY ...)) when a query's natural result is a list.
# Schema-only check: builds each plan, executes nothing.


def _nested_cols(schema):
    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if f.dataType.simpleString().split("<")[0] in ("array", "map", "struct")
    ]


def test_no_registry_query_emits_nested_columns(spark, registry_dfs_small):
    offenders = {}
    for name, df in registry_dfs_small.items():
        nested = _nested_cols(df.schema)
        if nested:
            offenders[name] = nested
    assert not offenders, (
        f"registry queries emit driver-unhashable nested columns {offenders}; "
        f"join arrays into a canonical string in BOTH dialects instead"
    )


def test_money_rounds_ties_identically_across_engines(spark):
    """Regression (round-6 sf1 parity): an e-4 integer sum ending in …50
    puts the 2-dp tie on a non-representable decimal if divided BEFORE
    rounding — Spark's BigDecimal HALF_UP then rounds up while DuckDB
    rounds the raw double to whichever side the nearest representation
    landed, a one-cent cross-engine flip (5 of 1000 Pareto revenues at
    the replicated sf1, whose sums gain a trailing zero). money()/
    money_sql() must resolve the tie on the exact integer, identically."""
    import duckdb

    from australian_company_etl_spark.functions.exactmath import money, money_sql
    from pyspark.sql import functions as F

    # …50 endings (the tie), a tie just above/below, negatives, scale 6
    cases_e4 = [3209364585250, 123450, 123449, 123451, -123450, 50, -50]
    df = spark.createDataFrame([(v,) for v in cases_e4], "v long").select(
        money(F.col("v").cast("decimal(38,0)"), 4).alias("m")
    )
    got = [r["m"] for r in df.collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {money_sql(str(v), 4)}").fetchone()[0] for v in cases_e4
    ]
    assert got == want
    # the tie itself rounds half away from zero on the exact integer
    assert got[1] == 12.35 and got[4] == -12.35 and got[2] == 12.34
    e6 = spark.createDataFrame([(123455000,)], "v long").select(
        money(F.col("v").cast("decimal(38,0)"), 6).alias("m")
    )
    assert e6.collect()[0]["m"] == con.execute(
        f"SELECT {money_sql('123455000', 6)}"
    ).fetchone()[0] == 123.46

    # past-2^53 cent sums (round-9 extreme-value regime, the measured
    # case): -200000000000002672 cents is an EXACT TIE between adjacent
    # doubles (ulp 32 there). Spark's Decimal→double rounds half-even;
    # DuckDB's raw HUGEINT→DOUBLE went to the truncated neighbor — a
    # 0.5-dollar cross-engine flip — until money_sql routed the sum
    # through BIGINT, whose →DOUBLE conversion is correctly rounded.
    big_cases = [-200000000000002672, 200000000000002672, 9007199254740993]
    big = spark.createDataFrame([(v,) for v in big_cases], "v long").select(
        money(F.col("v").cast("decimal(38,0)"), 2).alias("m")
    )
    got_big = [r["m"] for r in big.collect()]
    want_big = [
        # force the HUGEINT path DuckDB's sum() would produce
        con.execute(f"SELECT {money_sql(f'{v}::HUGEINT', 2)}").fetchone()[0]
        for v in big_cases
    ]
    assert got_big == want_big
    assert got_big[0] == -2000000000000027.0  # the correctly-rounded side


def test_money_handles_scale_below_ndp(spark):
    """money(col, scale=0) — whole-currency-unit sums — must divide by
    10^scale, not 10^ndp (a refactor briefly narrowed the contract: the
    reduction branch rewired the final division to 10^ndp, which is only
    correct after reduction; with scale < ndp it returned values 100x
    off)."""
    import duckdb

    from pyspark.sql import functions as F

    from australian_company_etl_spark.functions.exactmath import money, money_sql

    df = spark.createDataFrame([(1234,), (-7,)], "v long").select(
        money(F.col("v").cast("decimal(38,0)"), 0).alias("m")
    )
    assert [r["m"] for r in df.collect()] == [1234.0, -7.0]
    con = duckdb.connect()
    assert con.execute(f"SELECT {money_sql('1234', 0)}").fetchone()[0] == 1234.0
