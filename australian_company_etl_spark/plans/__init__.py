"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round 1 verified A–G; this list leads with
# everything that has no green CORRECTNESS row yet — the 26 H–N entries, the
# two queries whose oracles were fixed this round (extract_json_props,
# q12_priority_shipping), and the round-2 additions — so the driver's next
# pass covers them. Entries not named here follow in module order.
_VERIFY_FIRST = [
    # H text
    "text_langid",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "text_pii_scrub",
    "text_idf_vocab",
    "text_repetition_ratio",
    "text_contamination",
    "text_unigram_logprob",
    # I multimodal
    "mm_binary_meta",
    # J streaming-batch
    "events_tumbling_agg",
    "events_sessionize",
    # K pipeline
    "curate_corpus",
    "etl_dag_end_to_end",
    # L temporal
    "asof_join_last_error",
    "range_join_close_pairs",
    "rollup_events_hourly",
    "cube_orders_priority",
    # M sketches
    "sketch_kmv_distinct",
    "quantiles_event_value",
    "sketch_bloom_membership",
    # N sampling
    "sample_stratified_hash",
    "split_train_holdout",
    "pack_sequences",
    "mix_corpus_weighted",
    "chunk_documents",
    # round-1 oracle-cast fixes (failed the driver hash on HUGEINT rendering)
    "extract_json_props",
    "q12_priority_shipping",
    # round-2 additions
    "extract_title_company",
    "filter_valid_names",
    "match_multi_scorer",
    "dedup_url_canonical",
    "dedup_lines",
    "text_gopher_filters",
    "events_scd2_history",
    "events_funnel_steps",
    "events_distinct_skewsafe",
    "ann_pq_topk",
    "join_skew_salted",
    "shard_shuffle_deterministic",
    "dedup_semantic_kmeans",
    "sketch_cms_heavy_hitters",
    "rolling_window_24h",
    "pivot_user_event_matrix",
    "cluster_kmeans_embed",
    "mm_audio_features",
    "mm_audio_resample",
    "mm_image_features",
    "events_retention_cohorts",
    "events_value_outliers",
    "text_tfidf_topterms",
    "sketch_hll_distinct",
    "sample_weighted_priority",
    "incremental_rollup_merge",
    "text_inverted_index",
    "embed_random_projection",
    "quality_column_profile",
    "rank_neardup_pagerank",
    "events_resample_ffill",
    # ---- the 50-entry driver cap lands at events_value_outliers: the 50
    # entries above it all lack a green CORRECTNESS row (never checked,
    # failed the r01 hash, or new this round). text_tfidf_topterms (position
    # 51, also new) plus everything below rotates to lead round 3 ----
    # output-changing semantic updates whose r01 rows describe OLD outputs
    # (simhash exact-recall blocking, multi-scorer B3/B6) — still green rows,
    # re-verify next round; q11/ngram changed plan internals but are
    # value-identical to their r01-verified results, and table_health's driver
    # row is the weak rows-only form (its real gate is the os.stat test)
    "dedup_simhash",
    "match_fuzzy_levenshtein",
    "unify_entities",
    "q11_important_stock",
    "dedup_ngram_jaccard",
    "quality_table_health",
    # ---- new operators added later in round 2 (beyond the driver cap;
    # pytest + sf0.01 sweep green, rotate into the driver gate round 3+) ----
    "dedup_setsim_prefix",
    "dedup_substring_spans",
    "curate_keep_best",
    "dedup_incremental",
    "graph_triangle_count",
    "text_entropy",
    "events_anomaly_mad",
    "grouping_sets_report",
    "events_zorder_key",
    "events_session_window_native",
    "quality_constraint_checks",
    "privacy_pseudonymize",
    "privacy_k_anonymity",
    "events_markov_transitions",
    "sketch_hll_daily_merge",
    "mix_corpus_temperature",
    "api_page_keyset",
    "api_fulltext_rank",
    "events_corr_value_hour",
    "text_collocations_pmi",
    "window_value_deciles",
    "set_ops_customer_segments",
    "events_freshness",
    "events_gap_stats",
    "orders_rfm_segments",
    "mm_video_framesample",
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
        multimodal,
        streaming_batch,
        temporal,
        sketches,
        sampling,
        pipeline,
    ]
