"""Constructed boundary cases for the round-3 operators whose semantics
have an edge the bench corpora never hit (the J14 lesson: micros-precision
data hides exact-boundary behavior, so only hand-built rows pin it down).

Each case runs BOTH the Spark plan and its DuckDB oracle on the same
constructed events table and asserts (a) the two dialects agree and (b)
the value is the documented one — so a future edit that breaks either the
semantics or cross-dialect agreement fails here, not in a driver round.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

GAP_US = 30 * 60 * 1_000_000  # mirrors streaming_batch.SESSION_GAP_US

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: [(event_id, ts, user_id, event_type, value)] -> sf_dir with a
    single events table usable by both load_tables and a DuckDB view."""
    df = spark.createDataFrame(
        [(i, ts, u, et, v, None) for (i, ts, u, et, v) in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    return sf_dir, con


def _micros(us):
    return T0 + datetime.timedelta(microseconds=us)


class TestPeakConcurrencyBoundary:
    """J23 treats each event as a half-open interval [ts, ts + gap): an
    interval that ends exactly when another starts must NOT overlap it."""

    def _both(self, spark, tmp_path, deltas_us):
        from australian_company_etl_spark.plans.streaming_batch import (
            PEAK_CONCURRENCY_SQL,
            events_peak_concurrency,
        )

        rows = [(i, _micros(d), 1, "view", 1.0) for i, d in enumerate(deltas_us)]
        sf_dir, con = _write_events(spark, tmp_path, rows)
        got_spark = {
            r["event_type"]: r["peak_concurrent"]
            for r in events_peak_concurrency(spark, sf_dir).collect()
        }
        got_oracle = dict(con.execute(PEAK_CONCURRENCY_SQL).fetchall())
        assert got_spark == got_oracle
        return got_spark["view"]

    def test_exact_gap_pair_never_overlaps(self, spark, tmp_path):
        # [0, gap) and [gap, 2*gap): touching is not overlapping
        assert self._both(spark, tmp_path, [0, GAP_US]) == 1

    def test_one_micro_inside_overlaps(self, spark, tmp_path):
        assert self._both(spark, tmp_path, [0, GAP_US - 1]) == 2

    def test_same_timestamp_stacks(self, spark, tmp_path):
        assert self._both(spark, tmp_path, [0, 0, 0]) == 3


class TestFunnel3Boundary:
    """J22 chains each step with `>=` the previous step's timestamp: a
    step event at EXACTLY the prior step's ts qualifies; one micro before
    does not."""

    def _both(self, spark, tmp_path, rows):
        from australian_company_etl_spark.plans.streaming_batch import (
            FUNNEL3_SQL,
            events_funnel_3step,
        )

        sf_dir, con = _write_events(spark, tmp_path, rows)
        got_spark = events_funnel_3step(spark, sf_dir).collect()[0].asDict()
        cols = [d[0] for d in con.execute(FUNNEL3_SQL).description]
        got_oracle = dict(zip(cols, con.execute(FUNNEL3_SQL).fetchone()))
        assert got_spark == got_oracle
        return got_spark

    def test_same_timestamp_completes_all_steps(self, spark, tmp_path):
        rows = [
            (1, _micros(0), 1, "signup", 1.0),
            (2, _micros(0), 1, "click", 1.0),
            (3, _micros(0), 1, "purchase", 1.0),
        ]
        got = self._both(spark, tmp_path, rows)
        assert (got["n_step1"], got["n_step2"], got["n_step3"]) == (1, 1, 1)
        assert got["median_total_s"] == 0.0

    def test_step_one_micro_early_does_not_count(self, spark, tmp_path):
        rows = [
            (1, _micros(0), 1, "signup", 1.0),
            (2, _micros(-1), 1, "click", 1.0),  # before signup: not step 2
            (3, _micros(10), 1, "purchase", 1.0),
        ]
        got = self._both(spark, tmp_path, rows)
        assert (got["n_step1"], got["n_step2"], got["n_step3"]) == (1, 0, 0)
        assert got["median_total_s"] is None

    def test_purchase_before_click_does_not_complete(self, spark, tmp_path):
        rows = [
            (1, _micros(0), 1, "signup", 1.0),
            (2, _micros(20), 1, "click", 1.0),
            (3, _micros(10), 1, "purchase", 1.0),  # after signup, before click
        ]
        got = self._both(spark, tmp_path, rows)
        assert (got["n_step1"], got["n_step2"], got["n_step3"]) == (1, 1, 0)


class TestSnapshotDiffBoundary:
    """C12 classifies per-key change across the DIFF_CUTOFF refresh:
    all-new keys are 'added', keys with pre-cutoff history that grew are
    'changed', and an event AT the cutoff instant belongs to v2 only
    (v1 is `ts < cutoff`, half-open)."""

    @pytest.fixture()
    def cutoff(self):
        from australian_company_etl_spark.plans.quality import DIFF_CUTOFF

        return datetime.datetime.fromisoformat(DIFF_CUTOFF)

    def _both(self, spark, tmp_path, rows):
        from australian_company_etl_spark.plans.quality import (
            SNAPSHOT_DIFF_SQL,
            quality_snapshot_diff,
        )

        sf_dir, con = _write_events(spark, tmp_path, rows)
        got_spark = {
            r["change_type"]: r["n_keys"]
            for r in quality_snapshot_diff(spark, sf_dir).collect()
        }
        got_oracle = dict(con.execute(SNAPSHOT_DIFF_SQL).fetchall())
        assert got_spark == got_oracle
        return got_spark

    def test_classification(self, spark, tmp_path, cutoff):
        day = datetime.timedelta(days=1)
        rows = [
            # u1: only post-cutoff history -> added
            (1, cutoff + day, 1, "view", 1.0),
            # u2: pre-cutoff history plus a new event -> changed
            (2, cutoff - day, 2, "view", 1.0),
            (3, cutoff + day, 2, "view", 1.0),
            # u3: pre-cutoff history only -> unchanged
            (4, cutoff - day, 3, "view", 1.0),
        ]
        assert self._both(spark, tmp_path, rows) == {
            "added": 1,
            "changed": 1,
            "unchanged": 1,
        }

    def test_event_at_cutoff_instant_is_v2_only(self, spark, tmp_path, cutoff):
        # ts == cutoff is excluded from v1 (strict <) so the key is 'added'
        rows = [(1, cutoff, 1, "view", 1.0)]
        assert self._both(spark, tmp_path, rows) == {"added": 1}


def test_documents_doc_id_is_a_row_key(spark, sf_dir):
    """ADVICE r12: the inverted-index family's per-row array_distinct is
    equivalent to the oracle's global SELECT DISTINCT (doc_id, tok) ONLY
    while doc_id is a row key of documents. Pin the invariant on every
    gate corpus so a generator change that breaks it fails loudly here
    instead of silently overcounting df_docs."""
    from australian_company_etl_spark.sources.registry import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    total = docs.count()
    distinct = docs.select("doc_id").distinct().count()
    assert total == distinct, (
        f"documents has {total - distinct} repeated doc_id rows — the "
        f"text_inverted_index per-row-distinct rewrite requires doc_id "
        f"to be a row key (see its docstring)"
    )
