"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-9 rotation (VERDICT r08 task 1):
# code-changed-first, then oldest-green. Changed this round (8): the three
# consumers of the functions/ranks.py changes (ntile_from_rank moved to
# exact IntegralDivide arithmetic; segmented_rank's offsets join gained the
# left-join + raise_error reuse guard) — mix_curriculum_stages,
# window_value_deciles, orders_rfm_segments — plus the five extreme-value
# regime fixes (scripts/regime_sweep.py --regime extreme_values found
# them): events_value_outliers + events_corr_value_hour (pre-promoted
# squares, loud matched exact-moments envelope guard),
# quality_conf_distribution (BIGINT bucket), grouping_sets_report +
# rolling_window_24h (oracle integer-sum→BIGINT→DOUBLE cast — DuckDB's
# HUGEINT→DOUBLE is not correctly rounded past 2^53; that oracle-cast fix
# also touches every money_sql/sum-cents oracle, all replayed green at
# sf0.01 in parity_r9_sf001_wave1.log and again at the replicated sf1) —
# PLUS the seven hostile-names regime fixes (the oracle-side
# array_to_string([])-is-NULL class in the shared token scorers, the
# fingerprint norm, and the from_xml whitespace trim): extract_xml_fields,
# text_fingerprint, match_fuzzy_levenshtein, match_multi_scorer,
# match_blocked_fuzzy, unify_entities, etl_dag_end_to_end.
# Then every row whose latest driver check is still ROUND 5 (26), then
# the oldest round-6 rows (alphabetical within equal age) to fill 50.
# Rolls to round 10: the remaining r6 rows (dedup_url_canonical,
# embed_random_projection, events_anomaly_mad, events_distinct_skewsafe,
# events_freshness, events_gap_stats, events_markov_transitions,
# events_resample_ffill, events_retention_cohorts, events_scd2_history,
# events_session_window_native, events_sessionize, events_tumbling_agg,
# events_zorder_key, graph_triangle_count, incremental_rollup_merge,
# mm_binary_meta, pivot_user_event_matrix, set_ops_customer_segments,
# shard_shuffle_deterministic, sketch_hll_distinct, text_entropy,
# text_repetition_ratio). The registry stays FROZEN at 155 keys.
_VERIFY_FIRST = [
    # ---- plan/operator changed this round (15) -----------------------------
    "mix_curriculum_stages",
    "window_value_deciles",
    "orders_rfm_segments",
    "events_value_outliers",
    "events_corr_value_hour",
    "quality_conf_distribution",
    "grouping_sets_report",
    "rolling_window_24h",
    # hostile-names regime fixes (oracle-side):
    "extract_xml_fields",
    "text_fingerprint",
    "match_fuzzy_levenshtein",
    "match_multi_scorer",
    "match_blocked_fuzzy",
    "unify_entities",
    "etl_dag_end_to_end",
    # ---- latest driver row = round 5 (27) ----------------------------------
    "ann_lsh_topk",
    "asof_join_last_error",
    "chunk_documents",
    "dedup_cluster_cc",
    "dedup_embedding_cosine",
    "join_skew_salted",
    "mix_corpus_weighted",
    "pack_sequences",
    "q12_priority_shipping",
    "q13_cust_order_dist",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_global_sales_opp",
    "quantiles_event_value",
    "range_join_close_pairs",
    "sample_stratified_hash",
    "sketch_bloom_membership",
    "sketch_kmv_distinct",
    "split_train_holdout",
    "text_contamination",
    "text_gopher_filters",
    "text_idf_vocab",
    "text_pii_scrub",
    "text_quality_score",
    "text_token_count",
    # ---- oldest round-6 rows, alphabetical (fill to the 50-query window) ---
    "ann_pq_topk",
    "cluster_kmeans_embed",
    "dedup_incremental",
    "dedup_lines",
    "dedup_minhash_lsh",
    "dedup_semantic_kmeans",
    "dedup_setsim_prefix",
    "dedup_simhash",
    "dedup_substring_spans",
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
