"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-11 rotation (VERDICT r10 task 4):
# ALL 37 rows whose latest driver check is still ROUND 7 (the full list the
# r10 verdict enumerates — extract/curate families, the heavy TPC-H tail
# q2/q7/q8/q9/q11/q15/q16/q17/q20/q21 plus q3/q21, phonetic/pagerank/
# pareto/market-basket, tfidf/pmi/unigram, cms/hll-merge/theta sketches,
# temperature mix, weighted sampling, funnel/cdc/watermark events,
# mm image/video), then knn_graph_lsh (the r11 adaptive-plane work keeps
# the registry entry as the frozen 8-plane parity twin — re-pin it green
# the same round the adaptive default ships), then the 12 oldest round-8
# rows alphabetical to fill 50. Rolls to round 12: the remaining r8 rows
# (privacy_*, q1/q4/q5/q6/q10, quality_* profile/constraint/drift/dup/null/
# row, sketch_bottomk/hll_sliding, text_inverted_index, text_langid,
# window_top_orders_per_cust), then the r9 tier.
# The registry stays FROZEN at 155 keys.
_VERIFY_FIRST = [
    # ---- latest driver row = round 7 (37) -------------------------------
    "curate_corpus",
    "curate_keep_best",
    "events_cdc_snapshot",
    "events_funnel_3step",
    "events_funnel_steps",
    "events_watermark_lag_audit",
    "extract_first_wins_upsert",
    "extract_json_props",
    "extract_regex_fields",
    "extract_title_company",
    "extract_url_filter",
    "filter_valid_names",
    "match_phonetic_block",
    "mix_corpus_temperature",
    "mm_image_features",
    "mm_video_framesample",
    "orders_market_basket",
    "q11_important_stock",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q20_surplus_suppliers",
    "q21_last_shipper",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "rank_neardup_pagerank",
    "sample_weighted_priority",
    "sketch_cms_heavy_hitters",
    "sketch_hll_daily_merge",
    "sketch_theta_setops",
    "suppliers_pareto_abc",
    "text_collocations_pmi",
    "text_tfidf_topterms",
    "text_unigram_logprob",
    # ---- G8 parity twin re-pinned alongside the adaptive-default ship ---
    "knn_graph_lsh",
    # ---- oldest round-8 rows, alphabetical (fill to 50) -----------------
    "api_by_state",
    "api_lookup_by_key",
    "api_page_keyset",
    "api_search_ilike",
    "api_search_trigram",
    "dedup_exact",
    "events_attribution_last_touch",
    "events_peak_concurrency",
    "match_keyword_jaccard",
    "mm_audio_features",
    "mm_audio_resample",
    "norm_names",
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
