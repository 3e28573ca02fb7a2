"""Trigger the reference ETL DAG on the runner (the `airflow dags
trigger australian_company_etl` twin).

    python scripts/run_dag.py [--sf-dir DIR] [--out-dir DIR] [--max-workers N]

Rerunning with the same --out-dir resumes: committed tasks are skipped,
failed/missing ones run. Exit code 1 if any task failed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--out-dir", default="/tmp/aus_etl_dag_run")
    p.add_argument("--max-workers", type=int, default=4)
    args = p.parse_args()

    from australian_company_etl_spark.orchestration.dags import reference_dag
    from australian_company_etl_spark.orchestration.runner import run_dag
    from australian_company_etl_spark.session import get_spark

    spark = get_spark(app_name="aus-etl-dag")
    results = run_dag(spark, reference_dag(args.sf_dir), args.out_dir, max_workers=args.max_workers)
    print(json.dumps({n: r.as_dict() for n, r in results.items()}, indent=1, sort_keys=True))
    return 1 if any(r.status in ("failed", "upstream_failed") for r in results.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
