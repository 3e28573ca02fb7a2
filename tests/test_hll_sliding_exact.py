"""Pin the r12 interval/delta rewrite of M9's exact validation twin.

`sketch_hll_sliding_window` used to validate each trailing-window HLL
estimate with `in_window(raw events) -> countDistinct(user_id)` — a ≤W-fold
expansion of every event row (measured 60M rows / 737 MB / 86% of the
query's executor time at the sf10 bench tier). The r12 rewrite answers the
same EXACT integer from per-user coverage intervals and a ±1 delta
cumulative sum. These tests pin the equivalence on a corpus crafted to hit
every seam of the interval construction:

- users active on ADJACENT days (interval truncation at next-active-day),
- users with gaps exactly W-1, W, and W+1 days (boundary of the trailing
  window: coverage intervals that just touch vs just split),
- a single-day user (untruncated d..d+W-1 interval),
- NULL user_id rows on a day where they are the ONLY events (countDistinct
  semantics: the window row must survive with an exact count of 0),
- NULL ts rows (excluded by both forms),
- multiple event types sharing days (per-type partitioning).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _events_df(spark):
    day = lambda d: dt.datetime(2026, 3, 1, 12, 0) + dt.timedelta(days=d)
    rows = []
    eid = 0

    def ev(t, d, u):
        nonlocal eid
        eid += 1
        rows.append((eid, day(d) if d is not None else None, u, t, 1.0, "{}"))

    # type A — adjacency + gaps around the 7-day window width
    for d in (0, 1, 2, 8, 9, 16, 24):      # gaps of 6, 7, 8 days
        ev("A", d, 100)
    for d in (0, 6, 13, 21):               # exactly W-1, W, W+1 apart
        ev("A", d, 200)
    ev("A", 3, 300)                        # single-day user
    ev("A", 3, 300)                        # same-day duplicate event
    # type B — NULL-user-only day plus normal traffic; day 25 is more than
    # W-1 days past every real B user's last activity (day 12), so its
    # trailing window holds NO distinct users
    ev("B", 25, None)
    ev("B", 25, None)
    ev("B", 0, 400)
    ev("B", 12, 400)
    ev("B", 12, 500)
    # NULL ts rows (both types) — excluded everywhere
    ev("A", None, 100)
    ev("B", None, None)
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("hll_win") / "sfX")
    df = _events_df(spark)
    df.write.parquet(f"{p}/events.parquet")
    return p


def _reference_exact(spark, sf_dir):
    """The pre-r12 formulation, verbatim: window-expand raw events, then
    countDistinct per (type, win_end)."""
    from australian_company_etl_spark.plans.sketches import HLL_WIN_DAYS

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = (
        ev.select("event_type", F.to_date("ts").alias("day"))
        .distinct()
        .select("event_type", F.col("day").alias("win_end"))
    )
    l, d = ev.select("event_type", F.to_date("ts").alias("day"), "user_id").alias(
        "l"
    ), days.alias("d")
    joined = l.join(
        F.broadcast(d),
        (F.col("l.event_type") == F.col("d.event_type"))
        & (F.col("l.day") <= F.col("d.win_end"))
        & (F.col("l.day") > F.date_sub(F.col("d.win_end"), HLL_WIN_DAYS)),
    ).select("l.*", "d.win_end")
    return joined.groupBy("event_type", "win_end").agg(
        F.countDistinct("user_id").alias("n_exact_ref")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_interval_exact_equals_countdistinct_on_crafted_corpus(spark, crafted_dir):
    from australian_company_etl_spark.plans.sketches import sketch_hll_sliding_window

    got = _rows(
        sketch_hll_sliding_window(spark, crafted_dir).select(
            "event_type", "win_end", "n_distinct_exact"
        )
    )
    want = _rows(_reference_exact(spark, crafted_dir))
    assert got == want
    # the isolated NULL-user-only B window (day 25 = 2026-03-26) must be
    # present with an exact count of 0 — countDistinct ignores NULLs but
    # still emits the group
    b25 = [r for r in got if r[0] == "B" and str(r[1]) == "2026-03-26"]
    assert b25 == [("B", dt.date(2026, 3, 26), 0)]


def test_interval_exact_equals_countdistinct_on_gate_corpus(spark, sf_dir):
    from australian_company_etl_spark.plans.sketches import sketch_hll_sliding_window

    got = _rows(
        sketch_hll_sliding_window(spark, sf_dir).select(
            "event_type", "win_end", "n_distinct_exact"
        )
    )
    want = _rows(_reference_exact(spark, sf_dir))
    assert got == want
