"""100 TB integer-overflow envelope pins (round-7 proactive sweep).

Three consecutive rounds each surfaced one scale-only arithmetic failure
(r5: int32 idf past ~2147 docs; r6: money tie-rounding; r7 ADVICE: int32
ANSI overflow in the ngram size prune at ~215k-token docs). This sweep
generalizes the lesson: every exact-integer-ratio idiom `(k·N·c) div d`
whose N is a CORPUS-SCALE count (total bigrams, doc count, order count,
pr mass, block size, partsupp value sum) overflows int64 under ANSI mode
at realistic 100 TB magnitudes, even though the RESULT fits bigint.
DuckDB silently promotes to HUGEINT; Spark raises ARITHMETIC_OVERFLOW —
so the plans now route those intermediates through DECIMAL(38,0).

These tests evaluate the exact expression forms the plans use, at forced
corpus-scale magnitudes, and assert bit-equality with Python's unbounded
integers — plus, for each, that the OLD bigint form really does fail
under ANSI (so the pin can't silently pass on a non-ANSI session).
"""

from __future__ import annotations

import pytest


def _one_row(spark, **cols):
    names = sorted(cols)
    schema = ", ".join(f"{n} bigint" for n in names)
    return spark.createDataFrame([tuple(cols[n] for n in names)], schema)


def _val(spark, df, expr):
    from pyspark.sql import functions as F

    return df.select(F.expr(expr).alias("v")).collect()[0]["v"]


def _ansi_fails(spark, df, expr):
    from pyspark.sql import functions as F

    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.select(F.expr(expr).alias("v")).collect()


# realistic 100 TB magnitudes
N_BIGRAMS = 20_000_000_000_000  # ~2e13 bigrams in a 100 TB text corpus
N_DOCS = 20_000_000_000  # ~2e10 documents
N_ORDERS = 150_000_000_000  # TPC-H sf100k order count


def test_pmi_milli_survives_corpus_scale_counts(spark):
    """H14: (1000·N·c_xy) div (c_x·c_y) — numerator ~1e29, denominator
    ~1e26 at scale; quotient ≤ 1000·N fits bigint."""
    df = _one_row(
        spark, n_total=N_BIGRAMS, c_xy=9_999_999_999, c_x=10_000_000_001, c_y=13_000_000_019
    )
    got = _val(
        spark,
        df,
        "(CAST(1000 AS DECIMAL(38,0)) * n_total * c_xy)"
        " div (CAST(c_x AS DECIMAL(38,0)) * c_y)",
    )
    assert got == (1000 * N_BIGRAMS * 9_999_999_999) // (10_000_000_001 * 13_000_000_019)
    _ansi_fails(spark, df, "(1000 * n_total * c_xy) div (c_x * c_y)")


def test_tfidf_score_survives_corpus_scale_counts(spark):
    """H11: (tf·1e6·n_docs) div df — the numerator alone is ~2e19 at tf
    1000 on a 2e10-doc corpus."""
    df = _one_row(spark, tf=1000, n_docs=N_DOCS, df_docs=7_777_777)
    got = _val(
        spark, df, "(CAST(tf AS DECIMAL(38,0)) * 1000000 * n_docs) div df_docs"
    )
    assert got == (1000 * 1_000_000 * N_DOCS) // 7_777_777
    _ansi_fails(spark, df, "(tf * 1000000 * n_docs) div df_docs")


def test_fulltext_score_survives_corpus_scale_counts(spark):
    """D5 + serving probe: tf × ((1e6·n_docs) div df) — the idf numerator
    passes int64 at ~9.2e12 docs; the tf× product long before. Formula
    SHAPE (tf times the integer idf, not one fused ratio) must match the
    plans — fusing would change values."""
    big_n = 20_000_000_000_000  # > 9.2e12: the idf numerator alone passes int64
    df = _one_row(spark, tf=100, n_docs=big_n, df_docs=30_000)
    expr = (
        "CAST(CAST(tf AS DECIMAL(38,0))"
        " * ((CAST(1000000 AS DECIMAL(38,0)) * n_docs) div df_docs) AS BIGINT)"
    )
    got = _val(spark, df, expr)
    assert got == 100 * ((1_000_000 * big_n) // 30_000)
    _ansi_fails(spark, df, "tf * ((1000000 * n_docs) div df_docs)")


def test_basket_lift_survives_corpus_scale_counts(spark):
    """E27: (support·n_orders·1e6) div (cnt_a·cnt_b) at sf100k order
    counts with popular parts on both sides."""
    df = _one_row(
        spark, support=40_000_000, n_orders=N_ORDERS, cnt_a=60_000_000, cnt_b=70_000_000
    )
    got = _val(
        spark,
        df,
        "(CAST(support AS DECIMAL(38,0)) * n_orders * 1000000)"
        " div (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b)",
    )
    assert got == (40_000_000 * N_ORDERS * 1_000_000) // (60_000_000 * 70_000_000)
    _ansi_fails(spark, df, "(support * n_orders * 1000000) div (cnt_a * cnt_b)")


def test_phonetic_pairs_survive_giant_block(spark):
    """B7: n(n−1) div 2 — overflows at a 3.04e9-member block; with the
    decimal numerator the envelope is the output's own bigint range."""
    n = 4_000_000_000
    df = _one_row(spark, n_parts=n)
    got = _val(spark, df, "(CAST(n_parts AS DECIMAL(38,0)) * (n_parts - 1)) div 2")
    assert got == n * (n - 1) // 2
    _ansi_fails(spark, df, "(n_parts * (n_parts - 1)) div 2")


def test_pagerank_damp_survives_hub_mass(spark):
    """F9: 850000·s div 1e6 — s is incoming pr mass, past int64/850000 for
    a ≥1.08e7-edge boilerplate hub."""
    s = 20_000_000 * 1_000_000  # 2e7 in-edges, full pr each
    df = _one_row(spark, s=s)
    got = _val(
        spark, df, "150000 + (CAST(850000 AS DECIMAL(38,0)) * s) div 1000000"
    )
    assert got == 150000 + (850000 * s) // 1_000_000
    _ansi_fails(spark, df, "150000 + (850000 * s) div 1000000")


def test_q11_value_sum_survives_scale(spark):
    """E15: per-row v ≈ 1e15 (micros × hundredths); a bigint SUM overflows
    in the accumulator at large SFs — the plan sums DECIMAL(38,0). Pin the
    decimal sum's exactness and the ×1000 threshold compare at a magnitude
    a bigint sum cannot reach."""
    from pyspark.sql import functions as F

    v = 950_000_000_000_000  # ~1e15, realistic per-row stock value
    rows = 20_000
    df = spark.range(rows).select(F.lit(v).cast("bigint").alias("v"))
    total = df.agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("t")
    ).collect()[0]["t"]
    assert int(total) == v * rows  # 1.9e19 > int64 max: exact only in decimal
    assert int(total) > 2**63 - 1
    # threshold compare rides the decimal: (sum·1000 > total) stays exact
    # (the total literal itself exceeds int64, so it enters as a decimal)
    total_lit = F.expr(f"CAST('{v * rows}' AS DECIMAL(38,0))")
    cmp = df.agg(
        (F.sum(F.col("v").cast("decimal(38,0)")) * 1000 > total_lit).alias("c")
    ).collect()[0]["c"]
    assert cmp is True


def test_snapshot_diff_cent_sum_survives_total_skew(spark):
    """C12 pin (round-10 composed regime extreme_values+same_timestamp+
    single_user): the per-user cent sum must be DECIMAL(38,0) — a
    total-skew corpus (every event on one user × ±1e15 values → ±1e17
    cents/row × 1e5 rows) overflows a BIGINT sum, which Spark ANSI raises
    on while DuckDB silently promotes to HUGEINT. The sum is only compared
    for equality (never output), so decimal exactness is the whole
    contract. Asserts the fixed form at the failing magnitude and that the
    old bigint form really does fail under ANSI."""
    df = _one_row(spark, cents=100_000_000_000_000_000)  # 1e17 = cents(1e15)
    big = df.selectExpr("explode(sequence(1, 200)) as i", "cents")
    from pyspark.sql import functions as F

    got = big.agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("s")).collect()[0]["s"]
    assert int(got) == 200 * 100_000_000_000_000_000
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        big.agg(F.sum(F.col("cents")).alias("s")).collect()


def test_decimal_div_is_exact_truncating_bigint(spark):
    """The substrate all the fixes stand on: decimal(38,0) `div` returns
    BIGINT and truncates exactly (no intermediate rounding that could
    cross an integer boundary), matching DuckDB's `//` on positives.
    Quotients must themselves fit bigint — that is every call site's
    contract (each divides back under its output envelope)."""
    cases = [
        (10**29 + 7, 10**13 + 1),
        (10**29, 2 * 10**13 + 7),
        (2**63 - 1, 1),
        (999_999_999_999_999_999_999, 7_000_000_007),
    ]
    from pyspark.sql import functions as F

    for a, b in cases:
        df = spark.createDataFrame([(str(a), str(b))], "a string, b string")
        got = df.select(
            F.expr(
                "CAST(a AS DECIMAL(38,0)) div CAST(b AS DECIMAL(38,0))"
            ).alias("v")
        ).collect()[0]["v"]
        assert got == a // b, (a, b)


def test_resample_spine_envelope_refuses_outlier_lifetimes(spark, sf_dir, tmp_path):
    """L9 pin (round-11 extreme_timestamps regime): the per-user hourly
    spine is rows ∝ lifetime hours — one 1777 event + one year-9999 event
    makes every lifetime ~72M hours and the introducing sweep HUNG both
    engines materializing a ~1e11-row grid. Past RESAMPLE_MAX_HOURS both
    engines must refuse loudly with the matched 'envelope' marker; a
    lifetime just under the bound still resamples."""
    import duckdb

    from australian_company_etl_spark.plans.temporal import (
        RESAMPLE_MAX_HOURS,
        RESAMPLE_SQL,
        events_resample_ffill,
    )
    from australian_company_etl_spark.sources.registry import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    from pyspark.sql import functions as F

    out = str(tmp_path / "events.parquet")
    # one user's single event pushed to year 9999 → lifetime ≈ 70M hours
    hostile = ev.withColumn(
        "ts",
        F.when(
            F.col("event_id") == 0, F.lit("9999-12-31 23:59:59").cast("timestamp")
        ).otherwise(F.col("ts")),
    )
    hostile.coalesce(1).write.parquet(out)
    with pytest.raises(Exception, match="envelope"):
        events_resample_ffill(spark, str(tmp_path)).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{out}/*.parquet')"
    )
    with pytest.raises(Exception, match="envelope"):
        con.execute(RESAMPLE_SQL).fetchall()
    assert RESAMPLE_MAX_HOURS == 1_000_000  # documented bound
