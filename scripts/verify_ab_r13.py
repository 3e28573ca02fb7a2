"""r13 A/B: single-evaluation rewrites of the exact-verify filters.

The r12 plan dumps show the τ-threshold filters of dedup_setsim_prefix and
dedup_minhash_lsh fused into the verify JOIN CONDITION with the expensive
`size(array_intersect(...))` term duplicated (twice in the condition, a
third time in the output projection) — Catalyst has no CSE inside a single
join-condition/filter expression tree, so every candidate row pays 2-3
full O(na+nb) intersects.

Variants (outputs verified identical at sf0.1 before timing):

  setsim/cur    — production
  setsim/onemul — filter DEN·i ≥ NUM·(na+nb−i) rewritten to the exactly
                  equivalent (NUM+DEN)·i ≥ NUM·(na+nb): ONE intersect in
                  the condition (integers both sides, no boundary risk)
  minhash/cur   — production
  minhash/gen   — `inter` materialized once per row behind an
                  explode(array(inter)) generator barrier (predicates
                  referencing generator output cannot be pushed below the
                  Generate, so the intersect is evaluated exactly once and
                  the rounded-jaccard filter + output reuse the attribute)

Usage: python scripts/verify_ab_r13.py [sf10_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def setsim_onemul(spark, sf_dir):
    from australian_company_etl_spark.plans.dedup import (
        SETSIM_DEN,
        SETSIM_NUM,
        _docs_bytes,
        _setsim_broadcast_max_bytes,
        _setsim_parts,
    )

    sets, _prefix, cands = _setsim_parts(spark, sf_dir)
    sa = sets.select(
        F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"), F.col("n").alias("na")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"), F.col("n").alias("nb")
    )
    if _docs_bytes(sf_dir) <= _setsim_broadcast_max_bytes(spark):
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    else:
        sa, sb = sa.hint("shuffle_hash"), sb.hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cands.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        # DEN·i ≥ NUM·(na+nb−i)  ⇔  (NUM+DEN)·i ≥ NUM·(na+nb); exact ints
        .filter(
            (SETSIM_NUM + SETSIM_DEN) * inter
            >= SETSIM_NUM * (F.col("na") + F.col("nb"))
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            inter.cast("int").alias("n_common"),
            F.round(
                inter / (F.col("na") + F.col("nb") - inter), 4
            ).alias("jaccard"),
        )
        .distinct()
    )


def minhash_gen(spark, sf_dir):
    from australian_company_etl_spark.plans.dedup import (
        JACCARD_T,
        _band_candidates,
        _minhash_bands_sets,
    )

    bands, sh = _minhash_bands_sets(spark, sf_dir)
    cand = _band_candidates(bands)
    sa = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    joined = cand.join(sa, "doc_id_a").join(sb, "doc_id_b")
    once = joined.select(
        "doc_id_a",
        "doc_id_b",
        F.size("sh_a").alias("la"),
        F.size("sh_b").alias("lb"),
        F.explode(F.array(inter)).alias("inter"),
    )
    jac = F.col("inter") / (F.col("la") + F.col("lb") - F.col("inter"))
    return once.select(
        "doc_id_a", "doc_id_b", F.round(jac, 4).alias("jaccard")
    ).filter(F.col("jaccard") >= JACCARD_T)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else None
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans.dedup import (
        dedup_minhash_lsh,
        dedup_setsim_prefix,
    )
    from scripts.make_benchdata import ensure_sf10

    spark = get_spark(app_name="verify-ab-r13")

    small = "/root/testdata/sf0.1"
    for name, cur_fn, new_fn in (
        ("setsim", dedup_setsim_prefix, setsim_onemul),
        ("minhash", dedup_minhash_lsh, minhash_gen),
    ):
        exp = sorted(tuple(r) for r in cur_fn(spark, small).collect())
        got = sorted(tuple(r) for r in new_fn(spark, small).collect())
        print(f"# identity {name}: {'OK' if got == exp else 'MISMATCH'} ({len(exp)} rows)")
        if got != exp:
            sg = set(got) - set(exp)
            se = set(exp) - set(got)
            print("  new-only:", list(sg)[:3], " cur-only:", list(se)[:3])
            return

    if sf_dir is None:
        sf_dir = ensure_sf10(spark)
    variants = {
        "setsim_cur": lambda: dedup_setsim_prefix(spark, sf_dir),
        "setsim_onemul": lambda: setsim_onemul(spark, sf_dir),
        "minhash_cur": lambda: dedup_minhash_lsh(spark, sf_dir),
        "minhash_gen": lambda: minhash_gen(spark, sf_dir),
    }
    for name, fn in variants.items():
        spark.catalog.clearCache()
        fn().write.mode("overwrite").format("noop").save()
    results = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"verify-ab {name} round {r}")
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            results[name].append(dt)
            print(f"# round {r} {name}: {dt}s", flush=True)
    print({k: {"min": min(v), "runs": v} for k, v in results.items()})




def setsim_gen(spark, sf_dir):
    """Barrier variant: inter materialized ONCE per candidate row behind a
    generator; integer filter and both output columns reuse the attribute."""
    from australian_company_etl_spark.plans.dedup import (
        SETSIM_DEN,
        SETSIM_NUM,
        _docs_bytes,
        _setsim_broadcast_max_bytes,
        _setsim_parts,
    )

    sets, _prefix, cands = _setsim_parts(spark, sf_dir)
    sa = sets.select(
        F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"), F.col("n").alias("na")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"), F.col("n").alias("nb")
    )
    if _docs_bytes(sf_dir) <= _setsim_broadcast_max_bytes(spark):
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    else:
        sa, sb = sa.hint("shuffle_hash"), sb.hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    once = (
        cands.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a", "doc_id_b", "na", "nb",
            F.explode(F.array(inter)).alias("inter"),
        )
    )
    return (
        once.filter(
            (SETSIM_NUM + SETSIM_DEN) * F.col("inter")
            >= SETSIM_NUM * (F.col("na") + F.col("nb"))
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            F.col("inter").cast("int").alias("n_common"),
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .distinct()
    )


def main2():
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from australian_company_etl_spark.session import get_spark
    from scripts.make_benchdata import ensure_sf10

    spark = get_spark(app_name="verify-ab2-r13")
    small = "/root/testdata/sf0.1"
    exp = sorted(tuple(r) for r in setsim_onemul(spark, small).collect())
    got = sorted(tuple(r) for r in setsim_gen(spark, small).collect())
    print(f"# identity setsim_gen: {'OK' if got == exp else 'MISMATCH'} ({len(exp)})")
    if got != exp:
        return
    sf_dir = ensure_sf10(spark)
    variants = {
        "setsim_onemul": setsim_onemul,
        "setsim_gen": setsim_gen,
    }
    for name, fn in variants.items():
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    results = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            results[name].append(dt)
            print(f"# round {r} {name}: {dt}s", flush=True)
    print({k: {"min": min(v), "runs": v} for k, v in results.items()})


if __name__ == "__main__":
    main2() if len(sys.argv) > 1 and sys.argv[1] == "gen" else main()
