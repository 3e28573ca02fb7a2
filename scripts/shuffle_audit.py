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

`--components` audits the library components that are not registry
queries — the serving index build, the index probes, and the WebDataset
tar-shard write — with the same stage attribution.
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


def _component_actions(spark, sf_dir: str):
    """(name, thunk) pairs for the non-registry library components: the
    serving index publish, the term-pruned probes over it, and the
    WebDataset tar-shard write. The probes run AFTER the build (shared
    temp index dir), mirroring the real publish-then-serve dataflow."""
    import tempfile

    from australian_company_etl_spark.plans.api import (
        FT_QUERY_TERMS,
        FT_TOPK,
        TRGM_QUERY,
        TRGM_TOPK,
    )
    from australian_company_etl_spark.serving.http_api import (
        build_fulltext_index,
        build_trigram_index,
        fulltext_rank_from_index,
        trigram_rank_from_index,
    )
    from australian_company_etl_spark.sources import export
    from australian_company_etl_spark.sources.registry import load_tables

    idx = tempfile.mkdtemp(prefix="audit_idx_")
    meta: dict = {}

    def _build():
        meta.update(build_fulltext_index(spark, sf_dir, idx))
        build_trigram_index(spark, sf_dir, idx)

    return [
        ("serving_index_build", _build),
        (
            "serving_search_probe",
            lambda: fulltext_rank_from_index(
                spark, idx, FT_QUERY_TERMS, FT_TOPK, meta["n_docs"]
            ).collect(),
        ),
        (
            "serving_fuzzy_probe",
            lambda: trigram_rank_from_index(spark, idx, TRGM_QUERY, TRGM_TOPK).collect(),
        ),
        (
            "webdataset_write",
            lambda: export.export_webdataset(
                load_tables(spark, sf_dir, ["documents"])["documents"].select(
                    "doc_id", "text"
                ),
                tempfile.mkdtemp(prefix="audit_wds_"),
                "doc_id",
                {"txt": "text"},
                n_shards=8,
            ),
        ),
    ]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--components"]
    components = "--components" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
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

    if components:
        work = _component_actions(spark, sf_dir)
    else:
        names = args[1:] or HEADLINERS
        work = [
            (name, lambda name=name: queries[name](spark, sf_dir)
             .write.mode("overwrite").format("noop").save())
            for name in names
        ]

    rows = []
    for name, thunk in work:
        spark.catalog.clearCache()
        before = set(_stages(base, app_id))
        thunk()
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
