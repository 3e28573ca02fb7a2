"""One scheduler tick for the reference DAG — the crontab-invoked twin of
the Airflow scheduler daemon (etl_pipeline.py: schedule_interval="@daily",
catchup=False, start_date=2025-06-28).

    python scripts/run_schedule.py [--sf-dir DIR] [--base-out-dir DIR]
        [--start YYYY-MM-DD] [--now YYYY-MM-DD] [--catchup]
        [--interval-days N] [--max-workers N]

Each tick computes the due logical dates (closed intervals without a fully
committed dated out_dir) and runs them; ticks are idempotent, so a crontab
line like `0 * * * * python scripts/run_schedule.py --catchup` is the
whole scheduling daemon. --now exists for deterministic testing/backfills
and defaults to the actual current date.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--base-out-dir", default="/tmp/aus_etl_scheduled")
    p.add_argument("--start", default=None, help="YYYY-MM-DD (default: reference start_date)")
    p.add_argument("--now", default=None, help="YYYY-MM-DD (default: today)")
    p.add_argument("--catchup", action="store_true")
    p.add_argument("--interval-days", type=int, default=1)
    p.add_argument("--max-workers", type=int, default=4)
    args = p.parse_args()

    from australian_company_etl_spark.orchestration.dags import reference_dag
    from australian_company_etl_spark.orchestration.schedule import (
        REFERENCE_START,
        run_scheduled,
    )
    from australian_company_etl_spark.session import get_spark

    start = (
        datetime.date.fromisoformat(args.start) if args.start else REFERENCE_START
    )
    now = datetime.date.fromisoformat(args.now) if args.now else datetime.date.today()

    spark = get_spark(app_name="aus-etl-schedule")
    ran = run_scheduled(
        spark,
        lambda logical: reference_dag(args.sf_dir),
        args.base_out_dir,
        start=start,
        now=now,
        catchup=args.catchup,
        interval_days=args.interval_days,
        max_workers=args.max_workers,
    )
    print(
        json.dumps(
            {d: {n: r.as_dict() for n, r in res.items()} for d, res in ran.items()},
            indent=1,
            sort_keys=True,
        )
    )
    bad = any(
        r.status in ("failed", "upstream_failed")
        for res in ran.values()
        for r in res.values()
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
