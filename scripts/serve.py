"""Run the company lookup service: publish a serving snapshot, then serve.

The runnable twin of the reference's FastAPI service
(fastapi_service/main.py): Spark publishes the verified parquet snapshot
(its Postgres-load analog), then the D1-D6 plans answer HTTP lookups
against it. Usage:

    python scripts/serve.py [--sf-dir DIR] [--snapshot-dir DIR] [--port N]

Routes: /companies/{key}, /companies/search?q=, /companies/by_state?state=,
/companies?after=&limit=, /search?q= (served from the published posting
index; &scan=1 forces the corpus-scan plan), /fuzzy?q= (trigram index,
same &scan=1 escape), /health (snapshot + index manifest).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--snapshot-dir", default="/tmp/aus_etl_serving_snapshot")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args()

    from australian_company_etl_spark.serving.http_api import (
        make_server,
        snapshot_tables,
    )
    from australian_company_etl_spark.session import get_spark

    spark = get_spark(app_name="aus-etl-serve")
    manifest = snapshot_tables(spark, args.sf_dir, args.snapshot_dir)
    print(f"snapshot published to {args.snapshot_dir}: "
          f"{ {t: m['rows'] for t, m in manifest.items()} }", flush=True)

    server = make_server(spark, args.snapshot_dir, port=args.port)
    print(f"serving on http://127.0.0.1:{server.server_address[1]}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
