"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-7 rotation, RESTAGED at round end:
# semantics-touched-first, then oldest-green. The round's late review sweep
# changed many more plans than the original staging anticipated (ADVICE
# bigint prune + DECIMAL(38,0) overflow sweep + the operator/plans review
# fixes: multimodal ASCII clamp, min_by extractOne, derived-partsupp
# round-before-cast, data-scaled broadcast unhints, IVF centroid cap, CMS
# lazy total, distributed RFM/Pareto windows) — ALL code-changed queries
# lead the window (35), then the 8 rows whose latest driver check is still
# ROUND 3, then the oldest round-4 rows to fill 50. Every changed query was
# already replayed green at sf0.01 AND the replicated sf1 by
# scripts/verify_parity.py this round; the driver row makes it official.
# Rolls to round 8: the 4 declared no-oracle rows, the remaining r4 rows
# (match_exact_key, match_keyword_jaccard, match_blocked_fuzzy,
# unify_entities, quality_dup_keys/conf/column/constraint, privacy_*,
# quality_drift_psi, quality_snapshot_diff, api_search_ilike, api_by_state,
# api_search_trigram, q1, q5, q6, ann_lsh_multiprobe, text_inverted_index,
# sketch_bottomk_daily_merge, sketch_hll_sliding_window) and the 5 trivial
# point plans. The registry stays FROZEN at 155 keys.
_VERIFY_FIRST = [
    # ---- plan/operator/oracle changed this round (35) ----------------------
    "dedup_ngram_jaccard",
    "text_collocations_pmi",
    "text_tfidf_topterms",
    "api_fulltext_rank",
    "orders_market_basket",
    "match_phonetic_block",
    "q11_important_stock",
    "rank_neardup_pagerank",
    "mm_audio_features",
    "mm_audio_resample",
    "mm_image_features",
    "mm_video_framesample",
    "match_fuzzy_levenshtein",
    "match_multi_scorer",
    "quality_null_counts",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q20_surplus_suppliers",
    "q21_last_shipper",
    "text_unigram_logprob",
    "events_funnel_steps",
    "events_funnel_3step",
    "curate_corpus",
    "etl_dag_end_to_end",
    "sketch_cms_heavy_hitters",
    "ann_ivf_topk",
    "ann_recall_report",
    "orders_rfm_segments",
    "suppliers_pareto_abc",
    # ---- latest driver row = round 3 (8) ----------------------------------
    "curate_keep_best",
    "events_cdc_snapshot",
    "events_watermark_lag_audit",
    "knn_graph_lsh",
    "mix_corpus_temperature",
    "sample_weighted_priority",
    "sketch_hll_daily_merge",
    "sketch_theta_setops",
    # ---- oldest round-4 rows (fill to the 50-query window) ----------------
    "extract_regex_fields",
    "extract_url_filter",
    "extract_json_props",
    "extract_first_wins_upsert",
    "extract_xml_fields",
    "extract_title_company",
    "filter_valid_names",
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
