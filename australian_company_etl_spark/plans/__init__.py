"""Query plan registry.

Each plan module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins used by the
correctness gate). ``all_queries()`` / ``all_oracles()`` merge them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registration order is the driver's verification order (it checks the first
# 50 registered queries per round). Round-4 rotation (per VERDICT r03 tasks
# 1-2): lead with the 15 queries that have never had a driver CORRECTNESS
# row (the post-window round-3 additions — 12 sql-gated, 3 rows-only), then
# text_inverted_index (the one r03-red row; its postings column is now a
# canonical comma-joined string, hashable by the driver's pandas
# canonicalizer), then this round's semantic re-checks. The remaining ~34
# slots fall through to module order, which starts with the oldest r1-green
# rows (etl/matching/quality) — the right re-verification order. The
# registry is FROZEN this round (VERDICT r03 task 3): no new query keys.
_VERIFY_FIRST = [
    # ---- never driver-checked (15; judge's sf0.01 replay green) -----------
    "orders_market_basket",
    "suppliers_pareto_abc",
    "events_attribution_last_touch",
    "quality_snapshot_diff",
    "events_funnel_3step",
    "events_peak_concurrency",
    "mix_curriculum_stages",
    "sketch_bottomk_daily_merge",
    "ann_recall_report",
    "ann_lsh_multiprobe",
    "match_phonetic_block",
    "sketch_hll_sliding_window",
    "text_bpe_vocab",
    "text_bpe_tokenize",
    "embed_top_eigenvector",
    # ---- r03 driver-red, fixed this round (postings → canonical string) ---
    "text_inverted_index",
    # ---- remaining slots: module order = oldest r1-green rows first -------
    # Round 4's window closes after q6_forecast_revenue (A/B/C/D families +
    # q1/q3/q5/q6 re-verified). Round-5 rotation: any round-5 semantic
    # changes first, then continue the oldest-rows sweep where this window
    # stopped — the E-family tail (q10, window_top_orders_per_cust, q4,
    # q12, q14, q18, tpch_full q2-q22, deciles/set-ops/RFM/basket/pareto),
    # then the F/G r1-green rows (dedup_exact, minhash, embedding_cosine,
    # cluster_cc, ann_*), then the H/I/J/L/M/N r2-green rows.
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
