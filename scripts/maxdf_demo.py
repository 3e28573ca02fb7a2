"""Measure the /search max-df skip actually WINNING on a hot-token corpus —
the same measure-don't-assert discipline as skew_demo.py, applied to the
serving-side skew lever.

SURVEY §4 claims the skip bounds a stopword-class query term's cost: the
plain index probe puts O(df) posting rows per hot term through the shuffled
per-doc aggregate (the tok-sorted layout scatters a doc's postings across
term runs, so map-side combine cannot collapse them), while the skip
generates candidates from the RARE terms only and broadcast-semijoins the
hot posting runs against that candidate set before any shuffle — exchanges
carry O(|rare candidates|) rows however common the hot terms are.

This script builds exactly the claimed shape — 1M docs that ALL share a
five-token boilerplate family (df = 100%, far over the 5% line) plus a
50-doc-frequency long-tail uid token — then times the production plain
probe (`fulltext_rank_from_index`) against the production skip
(`fulltext_rank_maxdf`) for the same hot+rare query, asserting the skip
FIRED (info trail) and served row-identical results. Both paths are
warmed once (JVM JIT — scripts/benchutil.py's measured model) and timed
over the median of 3 runs. At this local scale the plain probe shuffles
~5M partial rows and sorts 1M scored docs vs the skip's ~50 shuffled
rows; at a 100 TB corpus the same query shape shuffles billions of rows
vs still ~|rare candidates| (both paths pay the same map-side scan of
the hot posting runs — the floor any exact answer pays).

Writes MAXDF_DEMO.json at the repo root and prints it; exits 1 if the
skip did not fire, results mismatch, or the skip was not faster.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 1_000_000
UID_FAMILIES = 20_000  # df(uidNNN) = N_DOCS / UID_FAMILIES = 50 docs
HOT_TOKENS = ["alpha", "beta", "gamma", "delta", "epsilon"]
QUERY = ["alpha", "beta", "gamma", "delta", "epsilon", "uid123"]  # 5 hot + 1 rare
TOPK = 10


def make_corpus(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    boiler = " ".join(HOT_TOKENS)
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " uid"), (F.col("id") % UID_FAMILIES).cast("string")
        ).alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def timed(fn, runs: int = 3) -> tuple[float, object]:
    fn()  # warmup: JIT + codegen, not timed
    out, secs = None, []
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        secs.append(time.monotonic() - t0)
    return round(statistics.median(secs), 3), out


def main() -> int:
    from australian_company_etl_spark.serving.http_api import (
        build_fulltext_index,
        fulltext_rank_from_index,
        fulltext_rank_maxdf,
    )
    from australian_company_etl_spark.session import get_spark

    spark = get_spark(app_name="maxdf-demo")
    work = tempfile.mkdtemp(prefix="maxdfdemo_")
    try:
        make_corpus(spark, work)
        d = os.path.join(work, "serving")
        os.makedirs(d)
        meta = build_fulltext_index(spark, work, d, n_files=8)
        n_docs = meta["n_docs"]

        sec_plain, plain_rows = timed(
            lambda: [
                r.asDict()
                for r in fulltext_rank_from_index(spark, d, QUERY, TOPK, n_docs).collect()
            ]
        )
        sec_skip, skip_out = timed(
            lambda: fulltext_rank_maxdf(spark, d, QUERY, TOPK, n_docs)
        )
        skip_rows, info = skip_out

        out = {
            "corpus": {
                "docs": N_DOCS,
                "postings": meta["rows"],
                "hot_df": N_DOCS,
                "rare_df": N_DOCS // UID_FAMILIES,
            },
            "query": QUERY,
            "topk": TOPK,
            "sec_plain_probe": sec_plain,
            "sec_maxdf_skip": sec_skip,
            "speedup": round(sec_plain / sec_skip, 2) if sec_skip else None,
            "skip_fired": bool(info.get("used")),
            "rows_match": skip_rows == plain_rows,
            "info": {k: info[k] for k in ("hot", "bound") if k in info},
            "load_avg": list(os.getloadavg()),
        }
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "MAXDF_DEMO.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        ok = out["skip_fired"] and out["rows_match"] and sec_skip < sec_plain
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
