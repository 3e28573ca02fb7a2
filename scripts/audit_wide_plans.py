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
        bad = [f"generate: {c}" for c in _generate_to_exchange_chains(plan)] + [
            f"single_partition: {c}"
            for c in _single_partition_carries_raw_rows(plan)
        ]
        if bad:
            offenders[name] = bad
    return offenders


#: the two adjudicated Generate-detector allowances (SURVEY §4 / VERDICT
#: r05-r07): dedup_lines shuffles DISJOINT segment rows (they tile the
#: document — ~1x corpus bytes, the minimum a global segment dedup pays)
#: and join_skew_salted's (key, salt) exchange carries the deliberately
#: salt-replicated small side. Applied to the generate detector ONLY, in
#: main(): before this, the script's healthy steady state exited 1 with
#: these two lines, so the exit code carried no signal (review finding).
ALLOWED_GENERATE = {"dedup_lines", "join_skew_salted"}


def apply_allowances(offenders: dict[str, list[str]]) -> dict[str, list[str]]:
    """Drop the adjudicated generate-tagged lines; anything else —
    including a SinglePartition finding on an allowed query — survives."""
    out = {}
    for name, chains in offenders.items():
        rest = (
            [c for c in chains if not c.startswith("generate: ")]
            if name in ALLOWED_GENERATE
            else chains
        )
        if rest:
            out[name] = rest
    return out


def _exchange_subtree_offenders(
    plan: str,
    exchange_marker: str,
    target_re: str,
    bounding: tuple[str, ...],
) -> list[str]:
    """ONE plan-tree walker behind both detectors (a review pass found the
    two had copy-pasted the depth/subtree/ancestor logic, so a fix to one
    could silently miss the other): every exchange line containing
    ``exchange_marker`` whose subtree contains a line matching
    ``target_re`` with no ``bounding`` node on the ancestor path between
    them. All targets in the subtree are examined, not just the first
    printed — a join subtree can hold a protected target in one branch and
    a raw one in another. ``bounding`` entries are SUBSTRING patterns
    against plan lines, not exact node names."""
    import re

    def depth(line: str) -> int:
        return len(re.match(r"^[\s:+\-]*", line).group(0))

    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if exchange_marker not in ln:
            continue
        d = depth(ln)
        offending = False
        for j in range(i + 1, len(lines)):
            dj = depth(lines[j])
            if dj <= d:
                break  # left the exchange's subtree
            if re.search(target_re, lines[j]):
                cur = dj
                ok = False
                for k in range(j - 1, i, -1):
                    dk = depth(lines[k])
                    if dk < cur:
                        cur = dk
                        if any(b in lines[k] for b in bounding):
                            ok = True
                            break
                if not ok:
                    offending = True
                    break
        if offending:
            bad.append(ln.strip()[:160])
    return bad


def _is_barrier_generate(line: str) -> bool:
    """True for the r13 evaluate-once idiom `explode(array(<one expr>))`:
    a SINGLE-element array explode is 1:1 — it exists to stop Catalyst
    duplicating an expensive expression (see dedup_minhash_lsh), never to
    expand rows, so it cannot turn an exchange into a token-row funnel.
    Detected by counting top-level commas inside the array(...) argument
    (zero ⇒ one element); the genuine expanding explodes (band structs,
    shingle grams) all carry top-level commas or different generators."""
    m = line.find("explode(array(")
    if m < 0:
        return False
    i = m + len("explode(array(")
    depth_p = 0
    for ch in line[i:]:
        if ch == "(" or ch == "[":
            depth_p += 1
        elif ch == ")" or ch == "]":
            if depth_p == 0:
                return True  # closed array( with no top-level comma seen
            depth_p -= 1
        elif ch == "," and depth_p == 0:
            return False
    return False  # truncated line — treat as expanding (conservative)


def _generate_to_exchange_chains(plan: str, key: str = "") -> list[str]:
    """The round-5-regression plan-shape detector, shared by the
    full-registry sweep here and tests/test_scale_plan.py: every
    `Exchange hashpartitioning(<key>…)` whose subtree contains ANY
    `Generate` with no Aggregate/Join ancestor between them — i.e. raw
    generated (exploded) rows crossing a shuffle. ``key`` narrows to
    exchanges on one column ("" = any key). Non-expanding single-element
    barrier generates are exempt (see _is_barrier_generate)."""
    masked = "\n".join(
        ln.replace("Generate ", "BarrierGen ", 1)
        if ("Generate " in ln and _is_barrier_generate(ln))
        else ln
        for ln in plan.splitlines()
    )
    return _exchange_subtree_offenders(
        masked,
        f"Exchange hashpartitioning({key}",
        r"Generate ",
        ("Aggregate", "Join"),
    )


#: plan nodes that bound the row count crossing an exchange: aggregates
#: reduce to O(groups), limits to O(k). SUBSTRING patterns — "Limit" also
#: matches WindowGroupLimit (O(groups·k)), GlobalLimit, LocalLimit.
_BOUNDING_NODES = ("Aggregate", "Limit", "TakeOrdered")

#: data-scaled leaf producers: parquet/table scans, literal frames, DSv2
#: BatchScan, the Range generator, and ReusedExchange — a reused shuffle
#: emits exactly as many rows as the original exchange, so a
#: SinglePartition directly over one is the same corpus funnel a direct
#: scan would be (review finding: the first version matched only *Scan
#: leaves, so any plan that fed the single partition through exchange
#: reuse passed the audit silently). InMemoryTableScan/InMemoryRelation
#: (persisted subtrees) added in round 9 (ADVICE r08): a cached corpus
#: read under a SinglePartition is the same funnel, and registry plans DO
#: persist reused subtrees.
_LEAF_RE = (
    r"\b(FileScan|LocalTableScan|Scan \w|BatchScan|ReusedExchange|Range \(|"
    r"InMemoryTableScan|InMemoryRelation)"
)


def _single_partition_carries_raw_rows(plan: str) -> list[str]:
    """The single-task-sort detector (VERDICT r07 What's-wrong #1/#2),
    shared by the full-registry sweep and tests/test_scale_plan.py: every
    `Exchange SinglePartition` whose subtree reaches a data-scaled leaf
    (see _LEAF_RE) with NO bounding node between them — i.e. raw rows
    funneling into one task. A SinglePartition exchange above an
    Aggregate (a 1-row global count, the ≤n_parts-row prefix-offsets
    frame of the distributed rank) is bounded by construction and
    allowed; `Window.orderBy` over a raw corpus is the shape this flags
    (Spark's own "Moving all data to a single partition" warning, made a
    mechanical gate)."""
    return _exchange_subtree_offenders(
        plan, "Exchange SinglePartition", _LEAF_RE, _BOUNDING_NODES
    )


def main() -> None:
    from australian_company_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    wide = tempfile.mkdtemp(prefix="wide_audit_")
    try:
        build_wide_dir(spark, sf_dir, wide)
        offenders = apply_allowances(audit(spark, wide))
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
