"""r13 A/B: Arrow-vectorized cosine kernel for the knn-graph scoring stage.

Three variants of knn_graph_lsh_probed at the adaptive sf10 config, timed
interleaved (noop sink, cache cleared between runs):

  cur   — production: interpreted zip_with/aggregate fold per pair
  pairs — Option A: same join, score via a pandas UDF (ArrowEvalPython)
          whose per-batch accumulation replicates the sequential fold
          bit-for-bit (explicit 64-step vectorized adds, NOT numpy
          pairwise sum)
  cogrp — Option B: cogrouped applyInPandas per bucket — each vector
          crosses the Python boundary ONCE per bucket, scores computed
          as 64 vectorized outer-product accumulations per group (same
          sequential order per pair)

Also verifies the three variants' OUTPUT is identical at the probe SF
(exact collect-and-compare on sf0.1) before timing.

Usage: python scripts/knn_ab_r13.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _seq_dot_batch(ma: np.ndarray, mb: np.ndarray) -> np.ndarray:
    """Row-wise dot with the EXACT sequential fold order: products first
    (each rounded once), then 64 in-order vectorized adds — bit-identical
    to F.aggregate(zip_with(a,b,x*y), 0.0, acc+x)."""
    prod = ma * mb
    acc = np.zeros(prod.shape[0], dtype=np.float64)
    for k in range(prod.shape[1]):
        acc = acc + prod[:, k]
    return acc


@pandas_udf(DoubleType())
def dot_seq_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.to_numpy()
    bv = b.to_numpy()
    ok = np.fromiter(
        (x is not None and y is not None for x, y in zip(av, bv)),
        dtype=bool,
        count=len(av),
    )
    if ok.all():
        return pd.Series(_seq_dot_batch(np.stack(av), np.stack(bv)))
    # slow path: null vectors (zero-norm policy) → null score
    out = np.full(len(av), np.nan)
    if ok.any():
        out[ok] = _seq_dot_batch(np.stack(av[ok]), np.stack(bv[ok]))
    res = pd.Series(out, dtype=object)
    res[~ok] = None
    return res


def variant_pairs(spark, sf_dir, planes, n_probes):
    from australian_company_etl_spark.plans.similarity import (
        _base,
        _bucket_spark,
        _keys_with_probes,
        KNN_GRAPH_K,
    )

    base = _base(spark, sf_dir)
    lhs = base.select(
        F.col("vec_id").alias("src_id"),
        F.col("e").alias("se"),
        F.explode(_keys_with_probes(F.col("e"), planes, n_probes)).alias("bucket"),
    )
    rhs = base.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("e").alias("ne"),
        _bucket_spark(F.col("e"), planes).alias("bucket"),
    )
    pairs = lhs.join(rhs, "bucket").filter(F.col("src_id") != F.col("nbr_id")).select(
        "src_id",
        "nbr_id",
        F.round(dot_seq_udf(F.col("se"), F.col("ne")), 6).alias("score"),
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_GRAPH_K)
        .select("src_id", "nbr_id", "score", "rank")
    )


def _cogroup_score(lkey, ldf: pd.DataFrame, rdf: pd.DataFrame):
    if len(ldf) == 0 or len(rdf) == 0:
        return pd.DataFrame({"src_id": [], "nbr_id": [], "dot": []}).astype(
            {"src_id": "int64", "nbr_id": "int64", "dot": "float64"}
        )
    src = ldf["src_id"].to_numpy()
    nbr = rdf["nbr_id"].to_numpy()
    la = ldf["se"].to_numpy()
    rb = rdf["ne"].to_numpy()
    lok = np.fromiter((x is not None for x in la), dtype=bool, count=len(la))
    rok = np.fromiter((x is not None for x in rb), dtype=bool, count=len(rb))
    m, n = len(src), len(nbr)
    S = np.full((m, n), np.nan)
    if lok.any() and rok.any():
        A = np.stack(la[lok])  # (m', 64)
        B = np.stack(rb[rok])  # (n', 64)
        acc = np.zeros((A.shape[0], B.shape[0]))
        for k in range(A.shape[1]):
            acc = acc + np.outer(A[:, k], B[:, k])
        S[np.ix_(lok, rok)] = acc
    keep = src[:, None] != nbr[None, :]
    si, ni = np.nonzero(keep)
    dots = S[si, ni]
    out = pd.DataFrame(
        {"src_id": src[si], "nbr_id": nbr[ni], "dot": dots}
    )
    # NaN (null-vector pairs) must become SQL NULL, not NaN (NaN sorts
    # ABOVE every number in Spark's DESC ordering; NULL sorts last like
    # the fold's NULL result)
    out["dot"] = out["dot"].astype(object).where(~pd.isna(out["dot"]), None)
    return out


def variant_cogroup(spark, sf_dir, planes, n_probes):
    from australian_company_etl_spark.plans.similarity import (
        _base,
        _bucket_spark,
        _keys_with_probes,
        KNN_GRAPH_K,
    )

    base = _base(spark, sf_dir)
    lhs = base.select(
        F.col("vec_id").alias("src_id"),
        F.col("e").alias("se"),
        F.explode(_keys_with_probes(F.col("e"), planes, n_probes)).alias("bucket"),
    )
    rhs = base.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("e").alias("ne"),
        _bucket_spark(F.col("e"), planes).alias("bucket"),
    )
    scored = (
        lhs.groupBy("bucket")
        .cogroup(rhs.groupBy("bucket"))
        .applyInPandas(_cogroup_score, "src_id long, nbr_id long, dot double")
    )
    pairs = scored.select(
        "src_id", "nbr_id", F.round(F.col("dot"), 6).alias("score")
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_GRAPH_K)
        .select("src_id", "nbr_id", "score", "rank")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else None
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans.similarity import (
        adaptive_n_planes,
        adaptive_probe_budget,
        knn_planes,
        knn_graph_lsh_probed,
    )
    from scripts.make_benchdata import ensure_sf10

    spark = get_spark(app_name="knn-ab-r13")

    # ── identity check at sf0.1 (parity planes + forced probes) ──────────
    small = "/root/testdata/sf0.1"
    pl_small = knn_planes(10)
    exp = sorted(
        tuple(r) for r in knn_graph_lsh_probed(spark, small, pl_small, 2).collect()
    )
    got_a = sorted(tuple(r) for r in variant_pairs(spark, small, pl_small, 2).collect())
    got_b = sorted(
        tuple(r) for r in variant_cogroup(spark, small, pl_small, 2).collect()
    )
    print(f"# identity pairs: {'OK' if got_a == exp else 'MISMATCH'} ({len(exp)} rows)")
    print(f"# identity cogrp: {'OK' if got_b == exp else 'MISMATCH'} ({len(exp)} rows)")
    if got_a != exp:
        print("  first diff:", next((a, e) for a, e in zip(got_a, exp) if a != e))
    if got_b != exp:
        print("  first diff:", next((a, e) for a, e in zip(got_b, exp) if a != e))

    if sf_dir is None:
        sf_dir = ensure_sf10(spark)
    import os as _os

    n = spark.read.parquet(_os.path.join(sf_dir, "embeddings.parquet")).count()
    np_ = adaptive_n_planes(n)
    planes = knn_planes(np_)
    probes = adaptive_probe_budget(np_)
    print(f"# corpus {n} rows → {np_} planes, {probes} probes")

    variants = {
        "cur": lambda: knn_graph_lsh_probed(spark, sf_dir, planes, probes),
        "pairs": lambda: variant_pairs(spark, sf_dir, planes, probes),
        "cogrp": lambda: variant_cogroup(spark, sf_dir, planes, probes),
    }
    # warm
    for name, fn in variants.items():
        spark.catalog.clearCache()
        fn().write.mode("overwrite").format("noop").save()
    results = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"knn-ab {name} round {r}")
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            results[name].append(dt)
            print(f"# round {r} {name}: {dt}s", flush=True)
    print({k: {"min": min(v), "runs": v} for k, v in results.items()})


if __name__ == "__main__":
    main()
