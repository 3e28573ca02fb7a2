"""r13 A/B: one-pass funnel rewrites + no-Expand column profile.

  funnel_steps / funnel_3step — VERDICT r12 item 7: the step chain is
  computed in ONE scan + ONE user-keyed aggregate: per user, the first
  step is a conditional min and each later step is
  array_min(filter(collect_list(step events), x >= prev)) — the same
  "earliest qualifying at-or-after" semantics, no per-step scan+join.

  quality_column_profile — VERDICT r12 item 8: Spark plans the 6-column
  exact countDistinct through an Expand (rows × 6 through one hash agg);
  the variant unions six single-distinct aggregates, each a two-phase
  partial agg over ONE pruned column, no Expand node.

Outputs verified identical (sorted-collect) at sf0.1 before timing.

Usage: python scripts/misc_ab_r13.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def funnel_steps_onepass(spark, sf_dir):
    from australian_company_etl_spark.sources.registry import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    e = ev.select("user_id", "event_type", us.alias("us"))
    agg = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias("signup_us"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).alias("purch"),
    )
    purchase_us = F.array_min(
        F.filter("purch", lambda x: x >= F.col("signup_us"))
    )
    return agg.select(
        "user_id",
        "signup_us",
        purchase_us.alias("purchase_us"),
    ).select(
        "user_id",
        "signup_us",
        "purchase_us",
        F.col("purchase_us").isNotNull().alias("converted"),
        F.expr("(purchase_us - signup_us) div 1000000").alias("secs_to_convert"),
    )


def funnel_3step_onepass(spark, sf_dir):
    from australian_company_etl_spark.plans.streaming_batch import FUNNEL3_STEPS
    from australian_company_etl_spark.sources.registry import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    e = ev.select("user_id", "event_type", us.alias("us")).filter(
        F.col("event_type").isin(*FUNNEL3_STEPS)
    )
    agg = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL3_STEPS[0], F.col("us"))).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL3_STEPS[1], F.col("us"))
        ).alias("clk"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL3_STEPS[2], F.col("us"))
        ).alias("pur"),
    )
    t2 = F.array_min(F.filter("clk", lambda x: x >= F.col("t1")))
    t3 = F.array_min(F.filter("pur", lambda x: x >= F.col("t2")))
    per_user = (
        agg.withColumn("t2", t2)
        .withColumn("t3", t3)
        .select("t1", "t2", "t3", F.expr("(t3 - t1) div 1000000").alias("lat_s"))
    )
    return per_user.agg(
        F.count("t1").alias("n_step1"),
        F.count("t2").alias("n_step2"),
        F.count("t3").alias("n_step3"),
        F.round(F.expr("percentile(lat_s, 0.5D)"), 3).alias("median_total_s"),
    )


def profile_union(spark, sf_dir):
    from australian_company_etl_spark.plans.quality import _PROFILE_COLS, _str_spark
    from australian_company_etl_spark.sources.registry import load_tables

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    branches = []
    for c, kind in _PROFILE_COLS:
        branches.append(
            orders.agg(
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
                _str_spark(F.min(F.col(c)), kind).alias("min_s"),
                _str_spark(F.max(F.col(c)), kind).alias("max_s"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                "min_s",
                "max_s",
            )
        )
    return reduce(lambda a, b: a.unionAll(b), branches)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans.quality import quality_column_profile
    from australian_company_etl_spark.plans.streaming_batch import (
        events_funnel_3step,
        events_funnel_steps,
    )

    spark = get_spark(app_name="misc-ab-r13")

    small = "/root/testdata/sf0.1"
    cases = (
        ("funnel_steps", events_funnel_steps, funnel_steps_onepass),
        ("funnel_3step", events_funnel_3step, funnel_3step_onepass),
        ("profile", quality_column_profile, profile_union),
    )
    for name, cur_fn, new_fn in cases:
        exp = sorted(tuple(r) for r in cur_fn(spark, small).collect())
        got = sorted(tuple(r) for r in new_fn(spark, small).collect())
        print(f"# identity {name}: {'OK' if got == exp else 'MISMATCH'} ({len(exp)} rows)")
        if got != exp:
            sg = [r for r in got if r not in set(exp)]
            se = [r for r in exp if r not in set(got)]
            print("  new-only:", sg[:3], " cur-only:", se[:3])
            return

    variants = {}
    for name, cur_fn, new_fn in cases:
        variants[name + "_cur"] = (cur_fn, sf_dir)
        variants[name + "_new"] = (new_fn, sf_dir)
    for name, (fn, d) in variants.items():
        spark.catalog.clearCache()
        fn(spark, d).write.mode("overwrite").format("noop").save()
    results = {k: [] for k in variants}
    for r in range(rounds):
        for name, (fn, d) in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"misc-ab {name} round {r}")
            t0 = time.perf_counter()
            fn(spark, d).write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            results[name].append(dt)
            print(f"# round {r} {name}: {dt}s", flush=True)
    print({k: {"min": min(v), "runs": v} for k, v in results.items()})


if __name__ == "__main__":
    main()
