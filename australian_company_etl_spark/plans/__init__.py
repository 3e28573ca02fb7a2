"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-8 rotation (VERDICT r07 task 3):
# code-changed-first, then oldest-green. Changed this round (14): the two
# distributed-window rewrites (mix_curriculum_stages' global ntile and
# window_value_deciles' per-segment trio, now the shared two-phase
# functions/ranks.py machinery), the two extractOne consumers of the
# NULLS-LAST min_by ordering fix (match_fuzzy_levenshtein, unify_entities),
# orders_rfm_segments (its rank helpers moved to the shared module), and
# the six empty-corpus sweep fixes (tests/test_empty_corpus.py: one-sided
# NULL-vs-0 coalesces in the C2/C8/K2 reports and the SQL-standard
# grand-total row the grouping-sets trio dropped on empty input), plus
# the three NULL-heavy sweep fixes (tests/test_null_corpus.py:
# text_fingerprint NULL-text handling, the audio oracle n_samples
# coalesce).
# Then every row whose latest driver check is still ROUND 4 (26), the 4
# declared no-oracle rows (rows-only driver check), and the oldest round-5
# rows to fill 50. Every changed query was already replayed green at sf0.01
# AND the replicated sf1 by scripts/verify_parity.py this round; the driver
# row makes it official. Rolls to round 9: the remaining r5 rows (q12,
# q13, q18, q19, q22, dedup_embedding_cosine, dedup_cluster_cc,
# ann_lsh_topk, text_quality_score/token_count/pii_scrub/idf_vocab/
# contamination/gopher_filters, range_join_close_pairs, join_skew_salted,
# rolling_window_24h, quantiles_event_value, sketch_bloom_membership,
# sample_stratified_hash, split_train_holdout, pack_sequences,
# mix_corpus_weighted, chunk_documents). The registry stays FROZEN at 155
# keys.
_VERIFY_FIRST = [
    # ---- plan/operator changed this round (14) -----------------------------
    "mix_curriculum_stages",
    "window_value_deciles",
    "match_fuzzy_levenshtein",
    "unify_entities",
    "orders_rfm_segments",
    # empty-corpus sweep fixes (count-not-sum buckets, oracle coalesce,
    # SQL-standard grand-total row on empty input):
    "quality_null_counts",
    "quality_constraint_checks",
    "etl_dag_end_to_end",
    "rollup_events_hourly",
    "cube_orders_priority",
    "grouping_sets_report",
    # NULL-heavy-corpus sweep fixes (NULL-text fingerprint, audio-oracle
    # n_samples coalesce):
    "text_fingerprint",
    "mm_audio_features",
    "mm_audio_resample",
    # ---- latest driver row = round 4 (26) ----------------------------------
    "match_exact_key",
    "match_keyword_jaccard",
    "match_blocked_fuzzy",
    "quality_dup_keys",
    "quality_conf_distribution",
    "quality_column_profile",
    "privacy_pseudonymize",
    "privacy_k_anonymity",
    "quality_drift_psi",
    "quality_snapshot_diff",
    "api_search_ilike",
    "api_by_state",
    "api_search_trigram",
    "api_lookup_by_key",
    "api_page_keyset",
    "q1_pricing_summary",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "ann_lsh_multiprobe",
    "text_inverted_index",
    "sketch_bottomk_daily_merge",
    "sketch_hll_sliding_window",
    "norm_names",
    "quality_row_counts",
    "events_attribution_last_touch",
    "events_peak_concurrency",
    # ---- the 4 declared no-oracle rows (rows-only driver check) ------------
    "embed_top_eigenvector",
    "quality_table_health",
    "text_bpe_vocab",
    "text_bpe_tokenize",
    # ---- oldest round-5 rows (fill to the 50-query window) -----------------
    "q10_returned_items",
    "window_top_orders_per_cust",
    "q4_order_priority",
    "dedup_exact",
    "ann_brute_topk",
    "text_langid",
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
