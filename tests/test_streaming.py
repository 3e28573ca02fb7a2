"""J3 — streaming twins must equal their batch counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from australian_company_etl_spark.plans.streaming_batch import (
    events_sessionize,
    events_tumbling_agg,
)
from australian_company_etl_spark.sources.registry import load_tables
from australian_company_etl_spark.streaming.pipeline import (
    run_sessionize_to_memory,
    run_tumbling_to_memory,
    run_user_totals_to_memory,
)


def _rows(df):
    return sorted(tuple(str(c) for c in r) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream_res = run_tumbling_to_memory(spark, sf_dir, name="t_tumbling")
    batch_res = events_tumbling_agg(spark, sf_dir)
    assert _rows(stream_res) == _rows(batch_res)


def test_stateful_sessionize_equals_batch(spark, sf_dir):
    stream_res = run_sessionize_to_memory(spark, sf_dir, name="t_sessions")
    batch_res = events_sessionize(spark, sf_dir)
    assert _rows(stream_res) == _rows(batch_res)


def test_stateful_user_totals_equals_batch(spark, sf_dir):
    stream_res = run_user_totals_to_memory(spark, sf_dir, name="t_totals")
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    batch_res = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    assert _rows(stream_res) == _rows(batch_res)
