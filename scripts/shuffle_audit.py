"""Measured shuffle/spill audit — "measure, don't guess" for the scale story.

Runs each headline query end-to-end (noop sink) and attributes the stages it
scheduled via the Spark UI REST API, reporting per-query totals:

  input bytes read, shuffle write bytes, shuffle read bytes, memory/disk
  spill bytes, task count

The plan-shape tests (tests/test_scale_plan.py) prove the *shape* (no
cartesian, broadcasts, pushdown); this script measures the *bytes* — the
quantity that actually decides whether a plan survives a 100x scale-up.
A query whose shuffle write is a small fraction of its input is
map-side-combined / pre-pruned; spill > 0 at bench scale would flag an
operator that won't fit executor memory at 100 TB.

Usage: python scripts/shuffle_audit.py [sf_dir] [query ...]
Defaults: /root/testdata/sf0.1, the bench HEADLINERS.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def _stages(base: str, app_id: str) -> dict[int, dict]:
    out = {}
    for s in _api(base, f"applications/{app_id}/stages?status=complete"):
        out[s["stageId"]] = s
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans import all_queries
    from bench import HEADLINERS

    spark = get_spark(app_name="aus-etl-shuffle-audit")
    base = spark.sparkContext.uiWebUrl
    if not base:
        print("Spark UI is disabled; set SPARK_GRAFT_UI=true", file=sys.stderr)
        return 2
    app_id = spark.sparkContext.applicationId
    queries = all_queries()
    names = sys.argv[2:] or HEADLINERS

    rows = []
    for name in names:
        spark.catalog.clearCache()
        before = set(_stages(base, app_id))
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        after = _stages(base, app_id)
        new = [s for sid, s in after.items() if sid not in before]
        agg = {
            "query": name,
            "input_mb": round(sum(s["inputBytes"] for s in new) / 1e6, 2),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in new) / 1e6, 2
            ),
            "shuffle_read_mb": round(sum(s["shuffleReadBytes"] for s in new) / 1e6, 2),
            "spill_mem_mb": round(sum(s["memoryBytesSpilled"] for s in new) / 1e6, 2),
            "spill_disk_mb": round(sum(s["diskBytesSpilled"] for s in new) / 1e6, 2),
            "stages": len(new),
            "tasks": sum(s["numCompleteTasks"] for s in new),
        }
        rows.append(agg)
        print(json.dumps(agg), flush=True)

    total_in = sum(r["input_mb"] for r in rows)
    total_sw = sum(r["shuffle_write_mb"] for r in rows)
    print(
        f"# total input {total_in:.1f} MB, shuffle write {total_sw:.1f} MB "
        f"({100 * total_sw / max(total_in, 0.01):.1f}% of input), "
        f"spill {sum(r['spill_mem_mb'] + r['spill_disk_mb'] for r in rows):.1f} MB",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
