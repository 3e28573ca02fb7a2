"""Dump `.explain("formatted")` for registry queries to plans/r12/ files.

Optimization-round evidence (r12 deliverable): one `<query>_<tag>.txt` per
query so plan claims ("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin")
are checkable against committed artifacts without running Spark.

Usage:
    python scripts/explain_all.py <tag> [sf_dir] [--only=a,b,c]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = args[0] if args else "before"
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    only = None
    sub = "r12"
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--dir="):
            sub = a.split("=", 1)[1]

    from australian_company_etl_spark.plans import all_queries
    from australian_company_etl_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", sub)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="explain-all")
    queries = all_queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    n_err = 0
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {type(e).__name__}: {e}"
            n_err += 1
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(f"# {name} @ {sf_dir} [{tag}]\n{txt}\n")
        print(f"# {name}", file=sys.stderr)
    print(f"wrote {len(queries)} plans to {out_dir} ({n_err} errors)")


if __name__ == "__main__":
    main()
