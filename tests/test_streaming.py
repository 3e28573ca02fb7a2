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


def test_state_survives_across_microbatches(spark, sf_dir, tmp_path):
    """Split events into 4 files, stream ONE file per trigger — per-user
    totals must accumulate across micro-batches (update mode: the LAST
    emitted row per user carries the running total)."""
    from australian_company_etl_spark.streaming.pipeline import user_totals_stream

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    src = str(tmp_path / "events_split")
    ev.select("event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type", "value").repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    q = (
        user_totals_stream(stream)
        .writeStream.format("memory")
        .queryName("t_multi")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # more emitted rows than users proves multiple batches updated state
    emitted = spark.table("t_multi").collect()
    n_users = ev.select("user_id").distinct().count()
    assert len(emitted) > n_users
    # final state per user (largest n_events) equals the batch aggregate
    finals = {}
    for r in emitted:
        if r.user_id not in finals or r.n_events > finals[r.user_id].n_events:
            finals[r.user_id] = r
    batch = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tot"))
        .collect()
    }
    assert set(finals) == set(batch)
    for uid, r in finals.items():
        assert r.n_events == batch[uid].n
        assert abs(r.total_value - batch[uid].tot) < 0.02
