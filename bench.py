"""Headline benchmark — one JSON line for the driver.

Runs the SURVEY §6 headliners (TPC-H core, minhash dedup, ANN brute force,
text analysis, event-time agg) at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is forced end-to-end through the
`noop` sink (full execution, no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINERS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "dedup_minhash_lsh",
    "ann_brute_topk",
    "text_langid",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "events_tumbling_agg",
]

# second-scale anchor: the slowest headliners re-timed at ~sf1 (10× sf0.1,
# generated once into <repo>/benchdata/sf1 — scripts/make_benchdata.py) so
# the per-round number has a same-workload scale trend, not a single point.
# Disable with SPARK_GRAFT_LARGE=0.
LARGE_HEADLINERS = [
    "dedup_minhash_lsh",
    "text_fingerprint",
    "q5_local_supplier",
    "q3_shipping_priority",
    "q10_returned_items",
    # one representative per remaining family, so the scale trend covers
    # ANN, codegen text scoring, and event-time aggregation too
    "ann_brute_topk",
    "text_quality_score",
    "events_tumbling_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans import all_queries

    spark = get_spark(app_name="aus-etl-bench")
    queries = all_queries()

    # all-core burn ~5s before any warmup or timed region (VERDICT r06
    # task 4): executor-thread warmup plus insurance against hosts that
    # throttle from idle. NB the round-7 measurement (SURVEY §6): THIS host
    # shows no machine-level idle ramp — a fixed all-core job profiles
    # identically from a 12-min-idle and a hot box — so the bench_r6_run4
    # first-run effect was in-JVM JIT depth + compile-scheduling variance,
    # which the untimed full-scale warmup tiers below address directly.
    from scripts.benchutil import cpu_burn

    burn_sec = cpu_burn(spark)

    # data-free host yardstick (SURVEY §6, round 9): the fixed sha2-64M
    # all-core job whose converged floor tracks the HOST's CPU-dense
    # throughput independent of any plan or parquet layout. Round 9
    # measured the same host swinging 0.55-0.65s → 0.79-0.91s → back
    # within one day (virtualized neighbors) — which fully explained the
    # round-8 "q3 drift". Three timed passes after the burn; compare
    # calibration floors BEFORE comparing any query seconds across runs.
    calib = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 64_000_000, 1, 32).selectExpr(
            "count(sha2(cast(id as string), 256)) as n"
        ).collect()
        calib.append(round(time.perf_counter() - t0, 3))

    # JVM/codegen warmup outside the timed region, two tiers:
    # (1) every headliner once at the smallest SF (plan compilation +
    #     codegen for all 12 plans);
    # (2) every headliner once UNTIMED at the benchmark SF itself — tiered
    #     JIT only reaches steady state after the hot codegen paths see
    #     full-scale row counts (the round-2 sf0.1 numbers were taken with
    #     C2 still compiling: minhash timed 6.5s at sf0.1 but 2.2s at sf1,
    #     where a full-scale warm run already preceded the timed loop).
    warm_dir = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else sf_dir
    for name in HEADLINERS:
        queries[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
    for name in HEADLINERS:
        spark.catalog.clearCache()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # min of 3 timed runs per query: machine noise at this data scale is of
    # the same order as the queries themselves, and the driver records one
    # number; the per-query spread (max-min across the timed runs) is
    # reported alongside so that number carries an error bar. The cache is
    # cleared before every run so internal persists from the previous run
    # can't turn a later run into a cache read — each timed run does the
    # full compute with warmed codegen/JIT.
    times: dict[str, float] = {}
    spreads: dict[str, float] = {}
    total = 0.0
    # ambient-load context for the timed numbers (VERDICT r05 task 2: a
    # regression claim must be separable from machine noise) — 1/5/15-min
    # load averages recorded immediately before each timed region.
    load_before = [round(x, 2) for x in os.getloadavg()]
    for name in HEADLINERS:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        best = min(runs)
        times[name] = best
        spreads[name] = round(max(runs) - best, 3)
        total += best
        print(f"# {name}: {best}s (spread {spreads[name]}s)", file=sys.stderr)

    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "spread": spreads,
        "load_avg_before": load_before,
        "load_avg_after": [round(x, 2) for x in os.getloadavg()],
        # measurement context (VERDICT r07 task 8): everything a reader
        # needs to classify this run without the SURVEY §6 noise model —
        # what warmed up before timing, and how to judge a loaded-box
        # number. The r7-measured model: this host has NO machine-level
        # idle ramp; first-run inflation is in-JVM tiered JIT (~10x on a
        # codegen path's first execution) plus occasional 1.5-2x C2
        # compile contention with the 32 executor threads.
        "context": {
            "burn_sec": burn_sec,
            "calib_sha2_64m": calib,
            "calib_note": "fixed data-free all-core job; floor ~0.55-0.91s depending on host neighbors — normalize cross-run query comparisons by this before claiming a regression",
            "warmup_tiers": [
                "all-core sha2 burn before any timed region",
                "every headliner once at sf0.001 (plan + codegen compile)",
                "every headliner once untimed at the bench SF (tiered JIT at full row counts)",
                "min of 3 timed runs, cache cleared before each",
            ],
            "cpus": os.cpu_count(),
            "quiet_box_bar": "1-min load_avg_before < cpus/8; above it, treat a drift as loaded-box noise unless it reproduces on a quiet run",
            "budget_note": "regression tripwire budgets live in scripts/bench_budget.py and are recorded in ITS shallower-warmup context, not this file's",
        },
    }
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    result["sf"] = float(sf) if sf else sf_dir

    if os.environ.get("SPARK_GRAFT_LARGE", "1") != "0":
        from scripts.make_benchdata import REPLICAS, ensure

        large_dir = ensure(spark)
        large_times: dict[str, float] = {}
        large_spreads: dict[str, float] = {}
        large_total = 0.0
        large_load_before = [round(x, 2) for x in os.getloadavg()]
        for name in LARGE_HEADLINERS:
            # one untimed run at the large SF first: tiered JIT only reaches
            # steady state after the hot codegen paths see full-scale row
            # counts (the sf0.001/sf0.1 runs alone leave C2 still compiling
            # through the first large run — measured ~3x on minhash)
            spark.catalog.clearCache()
            queries[name](spark, large_dir).write.mode("overwrite").format("noop").save()
            runs = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                queries[name](spark, large_dir).write.mode("overwrite").format("noop").save()
                runs.append(round(time.perf_counter() - t0, 3))
            best = min(runs)
            large_times[name] = best
            large_spreads[name] = round(max(runs) - best, 3)
            large_total += best
            print(f"# [sf1] {name}: {best}s (spread {large_spreads[name]}s)", file=sys.stderr)
        result["large"] = {
            "sf": round((float(sf) if sf else 0.1) * REPLICAS, 3),
            "value": round(large_total, 3),
            "unit": "sec",
            "queries": large_times,
            "spread": large_spreads,
            "load_avg_before": large_load_before,
            "load_avg_after": [round(x, 2) for x in os.getloadavg()],
        }

        # serving probe vs corpus scan at ~sf1 (SURVEY D7): the published
        # search indexes claim O(matched postings) probes — time the claim.
        # Index build happens OUTSIDE the timed region (it is the publish
        # step, amortized over every query the snapshot serves).
        import shutil
        import tempfile

        from australian_company_etl_spark.plans.api import (
            FT_QUERY_TERMS,
            FT_TOPK,
            TRGM_QUERY,
            TRGM_TOPK,
            api_fulltext_rank,
            api_search_trigram,
        )
        from australian_company_etl_spark.serving.http_api import (
            build_fulltext_index,
            build_trigram_index,
            fulltext_rank_from_index,
            trigram_rank_from_index,
        )

        idx_dir = tempfile.mkdtemp(prefix="bench_serving_idx_")
        ft_meta = build_fulltext_index(spark, large_dir, idx_dir)
        build_trigram_index(spark, large_dir, idx_dir)

        def _best_of_3(fn) -> float:
            fn().collect()  # untimed warm run (JIT + shuffle files)
            runs = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn().collect()
                runs.append(round(time.perf_counter() - t0, 3))
            return min(runs)

        probe_times = {
            "search_probe": _best_of_3(
                lambda: fulltext_rank_from_index(
                    spark, idx_dir, FT_QUERY_TERMS, FT_TOPK, ft_meta["n_docs"]
                )
            ),
            "search_scan": _best_of_3(lambda: api_fulltext_rank(spark, large_dir)),
            "fuzzy_probe": _best_of_3(
                lambda: trigram_rank_from_index(spark, idx_dir, TRGM_QUERY, TRGM_TOPK)
            ),
            "fuzzy_scan": _best_of_3(lambda: api_search_trigram(spark, large_dir)),
        }
        shutil.rmtree(idx_dir)
        result["serving_probe_vs_scan"] = {
            "sf": result["large"]["sf"],
            "probe_sec": round(probe_times["search_probe"] + probe_times["fuzzy_probe"], 3),
            "scan_sec": round(probe_times["search_scan"] + probe_times["fuzzy_scan"], 3),
            "queries": probe_times,
        }
        print(f"# serving probe vs scan: {result['serving_probe_vs_scan']}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
