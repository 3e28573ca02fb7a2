"""Measure the N9/E24 distributed-rank rewrite at a scale where the old
single-task window hurts (VERDICT r07 task 7).

Round 8 replaced the last two single-task sort plans: the curriculum
query's `ntile` over an unpartitioned window (`Exchange SinglePartition`
sorting the ENTIRE documents corpus in one task) and the decile query's
5-value `partitionBy(c_mktsegment)` (≤5 effective tasks). This script
builds a documents corpus ~160× the sf0.1 table (16M rows — big enough that
one task's sort dominates, small enough to run in seconds locally), runs
the OLD window form and the NEW two-phase distributed form
(functions/ranks.py — the production `mix_curriculum_stages` plan), and
records:

- identical stage assignments (sum/count checksums over (stage, shard)
  and a per-stage row-count histogram — aggregates over the corpus, no
  driver collect of the frame), and
- wall time old vs new. On 32 local cores the headroom is bounded by the
  1-JVM memory bus; on a real cluster the old form's single task is the
  whole job's critical path while the new form scales with executors —
  the plan shape, asserted here via the SinglePartition walker, is the
  durable evidence; the local speedup is the observable symptom.

The tie-dense layout (n_chars = doc_id % 997, ~16000 docs per tie value)
stresses exactly the boundary-tie case the range-partitioned rank must
get right. Writes CURRICULUM_DEMO.json at the repo root; exits 1 if the
two forms disagree on any checksum or the new plan still contains a
raw-row SinglePartition exchange.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 16_000_000
TIE_MOD = 997  # ~16000 docs per n_chars value — dense boundary ties


def make_corpus(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    df = (
        spark.range(0, N_DOCS, 1, 64)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % TIE_MOD).alias("n_chars"),
        )
    )
    df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def old_form(spark, sf_dir: str):
    """The pre-round-8 plan: ntile over an unpartitioned window — kept
    here (only here) as the measured baseline of the shape the rewrite
    removed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from australian_company_etl_spark.functions.textfns import phash_spark
    from australian_company_etl_spark.plans.sampling import (
        CURRICULUM_SHARDS,
        CURRICULUM_STAGES,
    )
    from australian_company_etl_spark.sources.registry import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    w = Window.orderBy(F.asc("n_chars"), F.asc("doc_id"))
    stage = F.ntile(CURRICULUM_STAGES).over(w)
    shard = phash_spark(F.col("doc_id").cast("string")) % CURRICULUM_SHARDS
    return docs.select(
        "doc_id",
        F.col("n_chars").alias("difficulty"),
        stage.cast("int").alias("stage"),
        shard.cast("int").alias("shard"),
    )


def checksums(df) -> dict:
    """Order-insensitive equality evidence without collecting the frame."""
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("stage").cast("bigint") * F.col("doc_id")).alias("stage_dot"),
        F.sum(F.col("shard").cast("bigint") * F.col("doc_id")).alias("shard_dot"),
    ).collect()[0]
    hist = {
        int(r["stage"]): int(r["n"])
        for r in df.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    return {
        "rows": int(agg["rows"]),
        "stage_dot": int(agg["stage_dot"]),
        "shard_dot": int(agg["shard_dot"]),
        "stage_hist": hist,
    }


def timed(fn, spark, sf_dir) -> tuple[dict, float]:
    fn(spark, sf_dir).count()  # warm: JIT + page cache
    t0 = time.monotonic()
    out = checksums(fn(spark, sf_dir))
    return out, round(time.monotonic() - t0, 3)


def main() -> int:
    from australian_company_etl_spark.plans.sampling import mix_curriculum_stages
    from australian_company_etl_spark.session import get_spark
    from scripts.audit_wide_plans import _single_partition_carries_raw_rows
    from scripts.benchutil import cpu_burn

    spark = get_spark(app_name="curriculum-demo")
    work = tempfile.mkdtemp(prefix="curriculumdemo_")
    try:
        make_corpus(spark, work)
        cpu_burn(spark)

        new_plan = (
            mix_curriculum_stages(spark, work)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        new_raw_single = _single_partition_carries_raw_rows(new_plan)

        old_sums, old_sec = timed(old_form, spark, work)
        new_sums, new_sec = timed(mix_curriculum_stages, spark, work)

        out = {
            "corpus_rows": N_DOCS,
            "tie_mod": TIE_MOD,
            "sums_match": old_sums == new_sums,
            "old_single_task_sec": old_sec,
            "new_distributed_sec": new_sec,
            "speedup": round(old_sec / max(new_sec, 1e-9), 2),
            "stage_hist": new_sums["stage_hist"],
            "new_plan_raw_singlepartition": new_raw_single,
            "load_avg": [round(x, 2) for x in os.getloadavg()],
        }
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "CURRICULUM_DEMO.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        return 0 if (out["sums_match"] and not new_raw_single) else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
