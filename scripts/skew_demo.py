"""Measure AQE skew-join splitting firing on the F2 band join (VERDICT r06
task 3): the one 100×-scale claim that was asserted rather than measured.

SURVEY §4 / plans/dedup.py:22-26 claim that at 100 TB the LSH band
self-join is the dominant shuffle and "AQE skew-split handles hot bands
(e.g. boilerplate-heavy shingles)". This script builds exactly that shape —
a template-farm corpus where one boilerplate shingle family covers ~13% of
documents, so all its docs share the same band-hash values and one reduce
partition receives the whole family per band — then runs the PRODUCTION
candidate join (`plans.dedup._band_candidates`, the same code
`dedup_minhash_lsh` executes) with skew-join off vs on and reads the final
adaptive plan for the split markers (`SortMergeJoin(skew=true)`,
`AQEShuffleRead … skewed`).

Thresholds are scaled to the local corpus, because AQE's defaults (256 MB
skewedPartitionThresholdInBytes, 64 MB advisory) are sized for a real
cluster — the point is to show the MECHANISM fires on the hot-band shape
and that splitting bounds the straggler, not to re-tune production
defaults. Two local-scale facts set the numbers below:

- AQE decides skew from MapStatus sizes, which are POST-COMPRESSION
  shuffle bytes: the hot partition's 3 000 identical band-hash strings
  lz4-compress ~10×, so its ~240 KB of rows report as ~30-100 KB. The
  local threshold must sit under that compressed size (24k), not under
  the raw size. At cluster scale the same shape is ~10^7 band rows on one
  key — GBs even compressed, far over the 256 MB default.
- `skewedPartitionFactor` is lowered 5 → 2 because the background corpus
  here is only ~7× the hot family; at 100 TB the median band partition is
  relatively far smaller and the default factor passes on its own.

Everything else (join shape, bands builder, AQE on) is the production
configuration. Writes SKEW_DEMO.json at the repo root and prints it; exits
1 if the adaptive plan shows NO skew split with the feature on or the two
runs disagree on the pair count.
"""

from __future__ import annotations

import json
import os
import random
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOT = 3000  # one boilerplate family — every doc shares ~all band values
N_UNIQUE = 20000  # background corpus: random docs, no shared bands
BOILERPLATE_TOKENS = 120
UNIQUE_TOKENS = 30
VOCAB = 50000

# local-scale AQE knobs (defaults in comments are the cluster-scale values)
DEMO_CONFS = {
    "spark.sql.shuffle.partitions": "256",  # session default: cpu count
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "24k",  # 256m
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "12k",  # 64m
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",  # 5.0
    # the band table is ~6 MB here, under the 10 MB broadcast default; at
    # scale it is the biggest table in the query, so force the SMJ path the
    # claim is about
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}

_SKEW_MARK = re.compile(r"skew=true|AQEShuffleRead[^\n]*skewed")


def make_corpus(spark, out_dir: str) -> None:
    rng = random.Random(42)
    boiler = " ".join(f"tpl{j}" for j in range(BOILERPLATE_TOKENS))
    rows = [(i, f"{boiler} u{i}") for i in range(N_HOT)]
    rows += [
        (
            N_HOT + i,
            " ".join(f"w{rng.randrange(VOCAB)}" for _ in range(UNIQUE_TOKENS)),
        )
        for i in range(N_UNIQUE)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.repartition(64).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def run_candidates(spark, bands) -> tuple[int, float, str]:
    """One timed candidate-count run; returns (pairs, sec, final plan).

    The aggregate DataFrame is retained so the FINAL adaptive plan
    (isFinalPlan=true, post-execution) is what gets inspected —
    `df.count()` runs its own query execution and would leave `df`'s own
    plan un-adapted."""
    from pyspark.sql import functions as F

    from australian_company_etl_spark.plans.dedup import _band_candidates

    cnt = _band_candidates(bands).agg(F.count(F.lit(1)).alias("n"))
    t0 = time.monotonic()
    n = cnt.collect()[0][0]
    sec = round(time.monotonic() - t0, 3)
    return int(n), sec, cnt._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    from australian_company_etl_spark.plans.dedup import _minhash_bands_sets
    from australian_company_etl_spark.session import get_spark

    spark = get_spark(app_name="skew-demo")
    saved = {}
    for k, v in DEMO_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    work = tempfile.mkdtemp(prefix="skewdemo_")
    try:
        make_corpus(spark, work)
        bands, _sh = _minhash_bands_sets(spark, work)
        bands.count()  # materialize the persisted builder once — all timed
        # runs then see the identical cached input, isolating the join
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        run_candidates(spark, bands)  # warmup: JIT + codegen, not timed
        n_off, sec_off, _plan_off = run_candidates(spark, bands)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        n_on, sec_on, plan_on = run_candidates(spark, bands)

        skew_lines = [
            ln.strip()[:120] for ln in plan_on.splitlines() if _SKEW_MARK.search(ln)
        ]
        out = {
            "corpus": {"hot_docs": N_HOT, "unique_docs": N_UNIQUE},
            "pairs_off": n_off,
            "pairs_on": n_on,
            "pairs_match": n_off == n_on,
            "sec_skew_off": sec_off,
            "sec_skew_on": sec_on,
            "skew_split_fired": bool(skew_lines),
            "skew_plan_lines": skew_lines[:6],
            "load_avg": list(os.getloadavg()),
            "confs": DEMO_CONFS,
        }
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "SKEW_DEMO.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        return 0 if (out["skew_split_fired"] and out["pairs_match"]) else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


if __name__ == "__main__":
    raise SystemExit(main())
