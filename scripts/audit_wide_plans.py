"""Wide-input plan audit for the whole registry (VERDICT r05 task 4).

The round-5 regression had one shape: an input-spread helper that no-ops on
wide (many-file) corpora let a downstream keyed requirement re-insert its
`Exchange hashpartitioning(key)` ABOVE a `Generate` — shuffling exploded
(expanded) rows instead of raw or combined ones. The shingle family is
fixed and plan-tested; this script sweeps EVERY registry query against a
corpus whose `documents`/`embeddings` tables are multi-file and at least
as wide as the session's parallelism (the 100 TB scan shape, where
`spread_if_narrow` passes through), and reports any plan where an
Exchange's subtree contains a Generate with no Aggregate or Join between
them — the raw-exploded-rows-cross-a-shuffle signature, for ANY hash key —
or where an `Exchange SinglePartition` funnels unaggregated leaf-scan rows
into one task (the single-task global-sort signature, VERDICT r07).

Usage: python scripts/audit_wide_plans.py [sf_dir]   (default sf0.001)
Exit code 1 if any offender is found.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_wide_dir(spark, sf_dir: str, out: str) -> None:
    """Copy the corpus with documents/embeddings rewritten as >= parallelism
    files; all other tables pass through untouched (symlink)."""
    par = spark.sparkContext.defaultParallelism
    os.makedirs(out, exist_ok=True)
    for t in os.listdir(sf_dir):
        # absolute target: a relative sf_dir would make the symlink resolve
        # relative to the tmp dir and dangle
        src = os.path.abspath(os.path.join(sf_dir, t))
        dst = os.path.join(out, t)
        if t.split(".")[0] in ("documents", "embeddings"):
            spark.read.parquet(src).repartition(par).write.mode("overwrite").parquet(dst)
        else:
            os.symlink(src, dst)


def audit(spark, wide_dir: str) -> dict[str, list[str]]:
    from australian_company_etl_spark.plans import all_queries

    offenders: dict[str, list[str]] = {}
    for name, fn in all_queries().items():
        try:
            df = fn(spark, wide_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit sweep, report and move on
            offenders[name] = [f"PLAN BUILD FAILED: {exc}"][:1]
            continue
        bad = _generate_to_exchange_chains(plan) + _single_partition_carries_raw_rows(
            plan
        )
        if bad:
            offenders[name] = bad
    return offenders


def _generate_to_exchange_chains(plan: str, key: str = "") -> list[str]:
    """The round-5-regression plan-shape detector, shared by the
    full-registry sweep here and tests/test_scale_plan.py: every
    `Exchange hashpartitioning(<key>…)` whose subtree contains ANY
    `Generate` with no Aggregate/Join ancestor between them — i.e. raw
    generated (exploded) rows crossing a shuffle. All Generates in the
    subtree are examined, not just the first printed: a join subtree can
    hold a protected Generate in one branch and a raw one in another.
    ``key`` narrows to exchanges on one column ("" = any key)."""
    import re

    def depth(line: str) -> int:
        return len(re.match(r"^[\s:+\-]*", line).group(0))

    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if f"Exchange hashpartitioning({key}" not in ln:
            continue
        d = depth(ln)
        offending = False
        for j in range(i + 1, len(lines)):
            dj = depth(lines[j])
            if dj <= d:
                break  # left the exchange's subtree
            if "Generate " in lines[j]:
                cur = dj
                ok = False
                for k in range(j - 1, i, -1):
                    dk = depth(lines[k])
                    if dk < cur:
                        cur = dk
                        if "Aggregate" in lines[k] or "Join" in lines[k]:
                            ok = True
                            break
                if not ok:
                    offending = True
                    break
        if offending:
            bad.append(ln.strip()[:160])
    return bad


#: plan nodes that bound the row count crossing an exchange: aggregates
#: reduce to O(groups), WindowGroupLimit to O(groups·k), limits to O(k).
_BOUNDING_NODES = ("Aggregate", "WindowGroupLimit", "Limit", "TakeOrdered")


def _single_partition_carries_raw_rows(plan: str) -> list[str]:
    """The single-task-sort detector (VERDICT r07 What's-wrong #1/#2),
    shared by the full-registry sweep and tests/test_scale_plan.py: every
    `Exchange SinglePartition` whose subtree reaches a leaf scan (FileScan
    / LocalTableScan / Scan) with NO bounding node between them — i.e.
    data-scaled raw rows funneling into one task. A SinglePartition
    exchange above an Aggregate (a 1-row global count, the ≤n_parts-row
    prefix-offsets frame of the distributed rank) is bounded by
    construction and allowed; `Window.orderBy` over a raw corpus is the
    shape this flags (Spark's own "Moving all data to a single partition"
    warning, made a mechanical gate)."""
    import re

    def depth(line: str) -> int:
        return len(re.match(r"^[\s:+\-]*", line).group(0))

    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = depth(ln)
        offending = False
        for j in range(i + 1, len(lines)):
            dj = depth(lines[j])
            if dj <= d:
                break  # left the exchange's subtree
            if re.search(r"\b(FileScan|LocalTableScan|Scan \w)", lines[j]):
                cur = dj
                ok = False
                for k in range(j - 1, i, -1):
                    dk = depth(lines[k])
                    if dk < cur:
                        cur = dk
                        if any(b in lines[k] for b in _BOUNDING_NODES):
                            ok = True
                            break
                if not ok:
                    offending = True
                    break
        if offending:
            bad.append(ln.strip()[:160])
    return bad


def main() -> None:
    from australian_company_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    wide = tempfile.mkdtemp(prefix="wide_audit_")
    try:
        build_wide_dir(spark, sf_dir, wide)
        offenders = audit(spark, wide)
    finally:
        shutil.rmtree(wide, ignore_errors=True)
    if offenders:
        print(
            f"{len(offenders)} plans shuffle raw generated rows or funnel raw "
            "rows through a SinglePartition exchange on a wide input:"
        )
        for name, chains in sorted(offenders.items()):
            for c in chains:
                print(f"  {name}: {c}")
        sys.exit(1)
    print(
        "OK: no registry plan shuffles raw generated rows or single-task-sorts "
        "raw rows on a wide input"
    )


if __name__ == "__main__":
    main()
