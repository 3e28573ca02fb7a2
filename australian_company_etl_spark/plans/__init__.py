"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-6 rotation (VERDICT r05 task 3):
# semantics-touched-first, then oldest-green. First the 8 shingle-family
# queries whose builders changed this round (zip-shift shingles — same
# results, new plan; the driver must re-gate them), then every row whose
# latest driver check is still ROUND 2 (18), then the oldest round-3 rows
# to fill the 50 slots (24 of 32; the last 8 r3 rows — sketch_hll_daily_
# merge, mix_corpus_temperature, sample_weighted_priority, curate_keep_
# best, events_cdc_snapshot, events_watermark_lag_audit, sketch_theta_
# setops, knn_graph_lsh — rotate in round 7). After this round no query's
# latest driver row is older than r3. The registry stays FROZEN at 155
# keys.
_VERIFY_FIRST = [
    # ---- shingle builders changed this round (8) --------------------------
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_substring_spans",
    "dedup_incremental",
    "dedup_setsim_prefix",
    "text_fingerprint",
    "text_repetition_ratio",
    "text_collocations_pmi",
    # ---- latest driver row = round 2 (18) ---------------------------------
    "mm_binary_meta",
    "events_tumbling_agg",
    "curate_corpus",
    "etl_dag_end_to_end",
    "dedup_url_canonical",
    "dedup_lines",
    "events_scd2_history",
    "events_funnel_steps",
    "events_distinct_skewsafe",
    "ann_pq_topk",
    "shard_shuffle_deterministic",
    "dedup_semantic_kmeans",
    "cluster_kmeans_embed",
    "mm_audio_features",
    "mm_audio_resample",
    "mm_image_features",
    "events_retention_cohorts",
    "events_value_outliers",
    # ---- oldest round-3 rows (fill to the 50-query window) ----------------
    "q11_important_stock",
    "dedup_simhash",
    "events_sessionize",
    "pivot_user_event_matrix",
    "window_value_deciles",
    "set_ops_customer_segments",
    "orders_rfm_segments",
    "rank_neardup_pagerank",
    "graph_triangle_count",
    "embed_random_projection",
    "text_tfidf_topterms",
    "text_entropy",
    "mm_video_framesample",
    "events_anomaly_mad",
    "events_session_window_native",
    "events_markov_transitions",
    "events_corr_value_hour",
    "events_freshness",
    "events_gap_stats",
    "incremental_rollup_merge",
    "events_resample_ffill",
    "grouping_sets_report",
    "events_zorder_key",
    "sketch_hll_distinct",
]


def _ordered(merged: dict) -> dict:
    out = {k: merged[k] for k in _VERIFY_FIRST if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def _released(fn: Callable) -> Callable:
    """Release the previous query's tracked caches before building this one
    (see operators/cache.py) — by invocation time the prior result has been
    materialized, so its persisted intermediates are dead weight."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from australian_company_etl_spark.operators.cache import release_tracked

        release_tracked()
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict = {}
    for mod in _plan_modules():
        merged.update(mod.QUERIES)
    return {k: _released(v) for k, v in _ordered(merged).items()}


def all_oracles() -> dict[str, str]:
    merged: dict = {}
    for mod in _plan_modules():
        merged.update(getattr(mod, "ORACLES", {}))
    return _ordered(merged)


def _plan_modules():
    from australian_company_etl_spark.plans import (
        api,
        bpe,
        dedup,
        etl,
        matching,
        multimodal,
        pipeline,
        quality,
        sampling,
        similarity,
        sketches,
        streaming_batch,
        temporal,
        text,
        tpch,
        tpch_full,
    )

    return [
        etl,
        matching,
        quality,
        api,
        tpch,
        tpch_full,
        dedup,
        similarity,
        text,
        bpe,
        multimodal,
        streaming_batch,
        temporal,
        sketches,
        sampling,
        pipeline,
    ]
