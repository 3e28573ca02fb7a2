"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-3 rotation (per VERDICT r02 task 1):
# the 50 slots = the 2 r02-red rows (oracle casts fixed this round) + the 36
# queries that have never had a driver CORRECTNESS row + the 5 remaining
# queries whose r01 green rows describe pre-round-2 outputs (simhash
# exact-recall blocking, multi-scorer B3/B6, q11 integer units, ngram
# compound blocking; quality_table_health is already in the never-checked 36)
# + 7 spares (the sf0.1 bench headliners — fresh green rows alongside any
# perf changes). With this pass every one of the 134 registered queries has a
# driver row across rounds 1–3. Entries not named here follow in module order.
_VERIFY_FIRST = [
    # ---- r02 driver-red (HUGEINT oracle rendering; CAST fixes this round) --
    "events_sessionize",
    "pivot_user_event_matrix",
    # ---- never driver-checked (36) ----------------------------------------
    "quality_table_health",
    "quality_column_profile",
    "quality_constraint_checks",
    "privacy_pseudonymize",
    "privacy_k_anonymity",
    "api_page_keyset",
    "api_fulltext_rank",
    "window_value_deciles",
    "set_ops_customer_segments",
    "orders_rfm_segments",
    "rank_neardup_pagerank",
    "dedup_setsim_prefix",
    "dedup_substring_spans",
    "dedup_incremental",
    "graph_triangle_count",
    "embed_random_projection",
    "text_tfidf_topterms",
    "text_inverted_index",
    "text_entropy",
    "text_collocations_pmi",
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
    "sketch_hll_daily_merge",
    "mix_corpus_temperature",
    "sample_weighted_priority",
    "curate_keep_best",
    # ---- r01-green rows describing pre-round-2 outputs (re-verify) --------
    "dedup_simhash",
    "match_fuzzy_levenshtein",
    "unify_entities",
    "q11_important_stock",
    "dedup_ngram_jaccard",
    # ---- new this round (no driver row yet) -------------------------------
    "quality_drift_psi",
    "events_cdc_snapshot",
    "events_watermark_lag_audit",
    "sketch_theta_setops",
    "knn_graph_lsh",
    "api_search_trigram",
    # ---- spare: the one bench headliner whose plan changed this round
    # (two-phase exact q1 agg); the others are unchanged + r02-green -------
    "q1_pricing_summary",
    # ---- 50-entry driver cap lands exactly here ---------------------------
    # Round-4 rotation: lead with the queries added after this round's
    # window filled — orders_market_basket, suppliers_pareto_abc,
    # events_attribution_last_touch, quality_snapshot_diff,
    # events_funnel_3step, events_peak_concurrency, mix_curriculum_stages,
    # sketch_bottomk_daily_merge, ann_recall_report, ann_lsh_multiprobe,
    # match_phonetic_block, sketch_hll_sliding_window,
    # text_bpe_vocab, text_bpe_tokenize, embed_top_eigenvector (last three
    # rows-only) — then any round-4 semantic changes, then the
    # never-rechecked long-tail.
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
