"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-7 rotation (VERDICT r06 task 1):
# semantics-touched-first, then oldest-green. First the 8 queries whose
# plans changed this round — dedup_ngram_jaccard (bigint size-ratio prune,
# ADVICE r06) and the 7 queries from the proactive 100 TB overflow sweep
# whose exact-ratio intermediates moved to DECIMAL(38,0) (same values at
# every testable SF, new expressions; the driver must re-gate them) — then
# the 8 rows whose latest driver check is still ROUND 3 (the r6 window's
# leftovers), then the oldest round-4 rows to fill the 50 slots. Deferred
# to round 8: the 4 declared no-oracle rows (embed_top_eigenvector,
# quality_table_health, text_bpe_vocab, text_bpe_tokenize — the driver's
# rows-only check adds nothing over their python-reference pytest gates),
# 5 trivial point plans (api_lookup_by_key, api_page_keyset,
# quality_row_counts, quality_null_counts, norm_names), and 4 r4 rows
# displaced by the overflow-sweep promotions (mix_curriculum_stages,
# events_attribution_last_touch, events_funnel_3step,
# events_peak_concurrency). After this round no sql-gated query's latest
# driver row is older than r4. The registry stays FROZEN at 155 keys.
_VERIFY_FIRST = [
    # ---- plan changed this round (8) --------------------------------------
    "dedup_ngram_jaccard",
    "text_collocations_pmi",
    "text_tfidf_topterms",
    "api_fulltext_rank",
    "orders_market_basket",
    "match_phonetic_block",
    "q11_important_stock",
    "rank_neardup_pagerank",
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
    "match_exact_key",
    "match_fuzzy_levenshtein",
    "match_multi_scorer",
    "match_keyword_jaccard",
    "match_blocked_fuzzy",
    "unify_entities",
    "quality_dup_keys",
    "quality_conf_distribution",
    "quality_column_profile",
    "quality_constraint_checks",
    "privacy_pseudonymize",
    "privacy_k_anonymity",
    "quality_drift_psi",
    "quality_snapshot_diff",
    "api_search_ilike",
    "api_by_state",
    "api_search_trigram",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "suppliers_pareto_abc",
    "ann_recall_report",
    "ann_lsh_multiprobe",
    "text_inverted_index",
    "sketch_bottomk_daily_merge",
    "sketch_hll_sliding_window",
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
