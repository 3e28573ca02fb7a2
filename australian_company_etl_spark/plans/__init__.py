"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-12 rotation (VERDICT r11 task 2):
# ALL 18 rows whose latest driver check is still ROUND 8 (the full list the
# r11 verdict enumerates — privacy_*, q1/q4/q5/q6/q10, the quality family,
# sketch_bottomk/hll_sliding, text_inverted_index/langid,
# window_top_orders_per_cust), then the 32 oldest ROUND-9 rows alphabetical
# to fill 50. Rolls to round 13: the two remaining r9 rows
# (text_quality_score, unify_entities), then the r10 tier.
# The registry stays FROZEN at 155 keys.
_VERIFY_FIRST = [
    # ---- latest driver row = round 8 (18) -------------------------------
    "privacy_k_anonymity",
    "privacy_pseudonymize",
    "q1_pricing_summary",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "quality_column_profile",
    "quality_constraint_checks",
    "quality_drift_psi",
    "quality_dup_keys",
    "quality_null_counts",
    "quality_row_counts",
    "sketch_bottomk_daily_merge",
    "sketch_hll_sliding_window",
    "text_inverted_index",
    "text_langid",
    "window_top_orders_per_cust",
    # ---- latest driver row = round 9, alphabetical (fill to 50) ---------
    "asof_join_last_error",
    "chunk_documents",
    "dedup_cluster_cc",
    "dedup_incremental",
    "dedup_lines",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_substring_spans",
    "etl_dag_end_to_end",
    "extract_xml_fields",
    "match_blocked_fuzzy",
    "match_fuzzy_levenshtein",
    "match_multi_scorer",
    "mix_corpus_weighted",
    "q12_priority_shipping",
    "q13_cust_order_dist",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_global_sales_opp",
    "quality_conf_distribution",
    "quantiles_event_value",
    "range_join_close_pairs",
    "sample_stratified_hash",
    "sketch_bloom_membership",
    "sketch_kmv_distinct",
    "split_train_holdout",
    "text_contamination",
    "text_fingerprint",
    "text_gopher_filters",
    "text_idf_vocab",
    "text_pii_scrub",
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
