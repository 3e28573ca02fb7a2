"""Replay the driver's correctness gate locally at an arbitrary SF.

For every registered query with an oracle twin, runs the Spark plan and the
DuckDB SQL side-by-side through tests.oracle_compare.compare (row count +
sorted-column schema + value hash — the driver's exact comparison) and
prints one line per query. Usage:

    python scripts/verify_parity.py [--ansi] [sf_dir] [first_n | name name ...]

Defaults: /root/testdata/sf0.01, all queries. Exit code 1 if any mismatch.
ANSI is the session default (pinned on — see session.py); ``--no-ansi``
replays the same gate with spark.sql.ansi.enabled=false, the legacy mode
the engine does NOT target but must not silently diverge in (round 9:
with sizeOfNull pinned, both modes are 151/151). ``--ansi`` is accepted
as an explicit no-op for continuity with the round-9 sweep logs. Either
flag must be FIRST and needs a fresh process (session config is fixed at
JVM creation).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--ansi":
        os.environ["SPARK_GRAFT_ANSI"] = "1"
        argv = argv[1:]
    elif argv and argv[0] == "--no-ansi":
        os.environ["SPARK_GRAFT_ANSI"] = "0"
        argv = argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    rest = argv[1:]
    first_n = int(rest[0]) if len(rest) == 1 and rest[0].isdigit() else 0
    wanted = rest if rest and not first_n else None

    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans import all_queries, all_oracles
    from tests.oracle_compare import compare, duckdb_connect

    spark = get_spark(app_name="aus-etl-verify")
    print(f"# spark.sql.ansi.enabled = {spark.conf.get('spark.sql.ansi.enabled')}", flush=True)
    queries = all_queries()
    oracles = all_oracles()
    con = duckdb_connect(sf_dir)

    names = [n for n in queries if n in oracles]
    if first_n:
        names = names[:first_n]
    elif wanted:
        # fail loudly on names that are not sql-gated registry queries — a
        # typo in a targeted replay used to be silently dropped, printing
        # "0/0 ok" and exiting 0 (a vacuous pass where the caller believed
        # the changed query was replayed)
        unknown = sorted(set(wanted) - set(names))
        if unknown:
            print(f"unknown or oracle-less query names: {unknown}", file=sys.stderr)
            return 2
        names = [n for n in names if n in wanted]

    failures = []
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            res = compare(queries[name](spark, sf_dir), con, oracles[name])
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"[{i}/{len(names)}] {name}: ERROR {exc}", flush=True)
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        status = "ok" if res["ok"] else f"FAIL {res}"
        print(f"[{i}/{len(names)}] {name}: {status} ({dt:.1f}s)", flush=True)
        if not res["ok"]:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
