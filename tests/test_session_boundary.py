"""Exact-gap boundary semantics of native session windows (J14).

Spark's `F.session_window(ts, gap)` gives each event the span
[t, t + gap) and MERGES overlapping-or-touching spans, so two events
exactly `gap` apart land in ONE session — the same outcome as J2's
lag-cumsum `> gap` rule, and the reason SESSION_NATIVE_SQL's oracle uses
`> gap` (not `>=`) for its new-session flag. Micros-precision bench data
never hits the boundary, so only a constructed pair can pin this down.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

GAP_US = 30 * 60 * 1_000_000  # mirrors streaming_batch.SESSION_GAP_US


def _sessions(spark, deltas_us):
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [("u1", t0 + datetime.timedelta(microseconds=d)) for d in deltas_us]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    return (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .count()
        .collect()
    )


def test_exact_gap_pair_merges_into_one_session(spark):
    assert len(_sessions(spark, [0, GAP_US])) == 1


def test_gap_plus_one_micro_splits_into_two_sessions(spark):
    assert len(_sessions(spark, [0, GAP_US + 1])) == 2


def test_oracle_rule_matches_spark_at_the_boundary(spark, tmp_path):
    """Run the exact-gap pair through BOTH the Spark native plan and the
    oracle's lag-based flag rule (in DuckDB) — they must agree on the
    session count for the boundary cases above."""
    import duckdb

    from australian_company_etl_spark.plans.streaming_batch import SESSION_NATIVE_SQL

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    for deltas, want in [([0, GAP_US], 1), ([0, GAP_US + 1], 2)]:
        rows = [
            (f"e{i}", "u1", t0 + datetime.timedelta(microseconds=d), "view", 1.0)
            for i, d in enumerate(deltas)
        ]
        df = spark.createDataFrame(
            rows, "event_id string, user_id string, ts timestamp, event_type string, value double"
        )
        p = str(tmp_path / f"ev_{want}_{len(deltas)}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )
        got = len(con.execute(SESSION_NATIVE_SQL).fetchall())
        con.close()
        assert got == want, f"oracle gives {got} sessions for deltas {deltas}, Spark gives {want}"
        assert len(_sessions(spark, deltas)) == want
