"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-10 rotation (VERDICT r09 task 2):
# code-changed-first, then oldest-green. Changed since their last driver
# check: the post-r9-verdict envelope/guard commit (matched money BIGINT
# envelope, segmented_rank loud count guard, J10/J16 per-row |v| <= 3e9
# scan guard, temporal/tpch oracle money_sql recomposition) touches
# mix_curriculum_stages, window_value_deciles, orders_rfm_segments,
# events_value_outliers, events_corr_value_hour, rollup_events_hourly,
# cube_orders_priority, grouping_sets_report, join_skew_salted,
# rolling_window_24h, match_exact_key; and this round's scale-trend
# instrumentation refactored the F10 candidate construction into
# _setsim_parts and G8 into the planes-parameterized variant —
# dedup_setsim_prefix, knn_graph_lsh. Then ALL 23 rows whose latest driver
# check is still ROUND 6 (events_* family, graph/rollup/pivot/set-ops,
# sketch_hll_distinct, text_entropy, text_repetition_ratio, mm_binary_meta,
# dedup_url_canonical, embed_random_projection, shard_shuffle_deterministic,
# incremental_rollup_merge), then the oldest round-7 rows alphabetical to
# fill 50. Rolls to round 11: the remaining r7 rows (curate_corpus,
# curate_keep_best, events_cdc_snapshot, events_funnel_3step,
# events_funnel_steps, events_watermark_lag_audit,
# extract_first_wins_upsert, extract_json_props,
# extract_regex_fields, extract_title_company, extract_url_filter,
# filter_valid_names, match_phonetic_block, mix_corpus_temperature,
# mm_image_features, mm_video_framesample, orders_market_basket,
# q2/q3/q7/q8/q9/q11/q15/q16/q17/q20/q21, rank_neardup_pagerank,
# sample_weighted_priority, sketch_cms_heavy_hitters,
# sketch_hll_daily_merge, sketch_theta_setops, suppliers_pareto_abc,
# text_collocations_pmi, text_tfidf_topterms, text_unigram_logprob).
# The registry stays FROZEN at 155 keys.
_VERIFY_FIRST = [
    # ---- plan/operator/oracle changed since last driver check (25) ---------
    # (quality_snapshot_diff: r10 composed-regime fix — D38 cent sum;
    #  text_token_count/pack_sequences: r10 hostile_docs \v ws-split fix;
    #  dedup_ngram_jaccard: r10 try_element_at empty-token fix;
    #  the whole similarity/_base family: r10 extreme_vectors fixes —
    #  zero-norm → NULL normalized vector, micro-unit integer envelope for
    #  G4/G6/G7, asc_nulls_last PQ ranking; plus the post-r9-verdict
    #  envelope/guard commit's consumers and the F10/G8 stats refactors)
    "quality_snapshot_diff",
    "text_token_count",
    "pack_sequences",
    "dedup_ngram_jaccard",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_pq_topk",
    "cluster_kmeans_embed",
    "dedup_embedding_cosine",
    "dedup_semantic_kmeans",
    "embed_random_projection",
    "knn_graph_lsh",
    "dedup_setsim_prefix",
    "mix_curriculum_stages",
    "window_value_deciles",
    "orders_rfm_segments",
    "events_value_outliers",
    "events_corr_value_hour",
    "rollup_events_hourly",
    "cube_orders_priority",
    "grouping_sets_report",
    "join_skew_salted",
    "rolling_window_24h",
    "match_exact_key",
    # ---- latest driver row = round 6 (22; embed_random_projection is
    # above with the changed set — dual reason) --------------------------
    "dedup_url_canonical",
    "events_anomaly_mad",
    "events_distinct_skewsafe",
    "events_freshness",
    "events_gap_stats",
    "events_markov_transitions",
    "events_resample_ffill",
    "events_retention_cohorts",
    "events_scd2_history",
    "events_session_window_native",
    "events_sessionize",
    "events_tumbling_agg",
    "events_zorder_key",
    "graph_triangle_count",
    "incremental_rollup_merge",
    "mm_binary_meta",
    "pivot_user_event_matrix",
    "set_ops_customer_segments",
    "shard_shuffle_deterministic",
    "sketch_hll_distinct",
    "text_entropy",
    "text_repetition_ratio",
    # ---- oldest round-7 rows, alphabetical (fill to the 50-query window;
    # ann_ivf/ann_recall are also base-policy consumers) -----------------
    "ann_ivf_topk",
    "ann_recall_report",
    "api_fulltext_rank",
]


def _ordered(merged: dict, strict: bool = False) -> dict:
    # strict (the QUERIES path): fail loudly on a misspelled rotation
    # entry — silently dropping it would shrink the driver's 50-query
    # verification window with no error, the same vacuous-pass class the
    # verify_parity name check closes (review finding). The ORACLES path
    # stays lenient: the no-oracle rows are in _VERIFY_FIRST by design.
    unknown = set(_VERIFY_FIRST) - set(merged)
    if strict and unknown:
        raise ValueError(f"_VERIFY_FIRST names not in the registry: {sorted(unknown)}")
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
    return {k: _released(v) for k, v in _ordered(merged, strict=True).items()}


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
