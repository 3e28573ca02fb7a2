"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-5 rotation (VERDICT r04 task 3):
# no registry semantics changed this round (the spread_if_narrow swap is
# plan-shape only), so the window is a pure oldest-green-first sweep —
# first every row whose latest driver check is still ROUND 1 (the E-family
# tail, tpch_full, and the F/G dedup/ANN cores: 24 rows), then the oldest
# round-2 rows (text H1-H10, temporal L1-L6, sketches M1-M4, sampling
# N1-N6) to fill the 50 slots. After this round no query's latest driver
# row is older than r2; the remaining r2 rows rotate in round 6. The
# registry stays FROZEN at 155 keys.
_VERIFY_FIRST = [
    # ---- latest driver row = round 1 (24) ---------------------------------
    "q10_returned_items",
    "window_top_orders_per_cust",
    "q4_order_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q13_cust_order_dist",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q19_disjunctive_pred",
    "q20_surplus_suppliers",
    "q21_last_shipper",
    "q22_global_sales_opp",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_cluster_cc",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # ---- oldest round-2 rows (fill to the 50-query window) ----------------
    "q12_priority_shipping",
    "text_langid",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "text_pii_scrub",
    "text_idf_vocab",
    "text_repetition_ratio",
    "text_contamination",
    "text_unigram_logprob",
    "text_gopher_filters",
    "asof_join_last_error",
    "range_join_close_pairs",
    "rollup_events_hourly",
    "cube_orders_priority",
    "join_skew_salted",
    "rolling_window_24h",
    "sketch_kmv_distinct",
    "quantiles_event_value",
    "sketch_bloom_membership",
    "sketch_cms_heavy_hitters",
    "sample_stratified_hash",
    "split_train_holdout",
    "pack_sequences",
    "mix_corpus_weighted",
    "chunk_documents",
    "shard_shuffle_deterministic",
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
