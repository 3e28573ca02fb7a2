"""Root-cause probe for the setsim sf10 residual bimodality (VERDICT r11
task 3 — SETSIM_PIN_r11.json recorded identical pinned plans splitting
~43s vs ~65s run-to-run and adjudicated it "GC variance" without
evidence).

Runs `dedup_setsim_prefix` at the sf10 bench tier N times inside ONE JVM
with `-Xlog:gc*` enabled (via the SPARK_GRAFT_DRIVER_JAVA_OPTS session
knob), then attributes each run's wall time to the GC pauses that occurred
inside its window. If the slow mode is GC, the slow runs carry the extra
pause seconds; if the pause deltas cannot explain the wall-time deltas,
the bimodality is NOT collector behavior and the adjudication changes.

Optional lever flags re-run the same probe under a candidate config:
  --lever region32   -XX:G1HeapRegionSize=32m (44M-row array payloads →
                     humongous allocations at the default region size)
  --lever parallel   -XX:+UseParallelGC (throughput collector)
  --runs N           timed runs (default 6)

Usage: python scripts/setsim_gc_probe.py [--lever region32] [--runs 6]
Prints one JSON line per run {run, sec, gc_pause_sec, n_pauses, full_gcs}
and a summary line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf10"
)
GC_LOG = "/tmp/setsim_gc_probe.log"

LEVERS = {
    "region32": "-XX:G1HeapRegionSize=32m",
    "parallel": "-XX:+UseParallelGC",
    "region16": "-XX:G1HeapRegionSize=16m",
}


def _parse_gc(path: str, t0: float, t1: float) -> dict:
    """Sum GC pauses whose uptime falls in [t0, t1) (seconds since JVM
    start). -Xlog:gc with uptime decoration lines look like
    `[123.456s][info][gc] GC(42) Pause Young (Normal) ... 12.345ms`."""
    pauses = []
    fulls = 0
    if not os.path.exists(path):
        return {"gc_pause_sec": None, "n_pauses": 0, "full_gcs": 0}
    pat = re.compile(r"\[(\d+\.\d+)s\].*Pause (\w+).*?(\d+\.\d+)ms")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            up, kind, ms = float(m.group(1)), m.group(2), float(m.group(3))
            if t0 <= up < t1:
                pauses.append(ms / 1000.0)
                if kind == "Full":
                    fulls += 1
    return {
        "gc_pause_sec": round(sum(pauses), 2),
        "n_pauses": len(pauses),
        "full_gcs": fulls,
    }


def main() -> int:
    args = sys.argv[1:]
    runs = 6
    lever = None
    while args:
        if args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        elif args[0] == "--lever":
            lever = args[1]
            args = args[2:]
        else:
            print(__doc__, file=sys.stderr)
            return 2

    opts = f"-Xlog:gc*:file={GC_LOG}:uptime"
    if lever:
        opts += " " + LEVERS[lever]
    os.environ["SPARK_GRAFT_DRIVER_JAVA_OPTS"] = opts
    if os.path.exists(GC_LOG):
        os.remove(GC_LOG)

    from australian_company_etl_spark.plans.dedup import dedup_setsim_prefix
    from australian_company_etl_spark.session import get_spark

    spark = get_spark(app_name=f"setsim_gc_probe_{lever or 'base'}")
    jvm_start = time.time()  # approx: uptime 0 ≈ session create; correct by
    # reading the JVM's own uptime so window mapping is exact
    uptime_now = (
        spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean().getUptime()
        / 1000.0
    )
    jvm_start = time.time() - uptime_now

    dedup_setsim_prefix(spark, SF10_DIR).write.mode("overwrite").format("noop").save()
    out = []
    for i in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        dedup_setsim_prefix(spark, SF10_DIR).write.mode("overwrite").format("noop").save()
        t1 = time.time()
        rec = {"run": i, "sec": round(t1 - t0, 2)}
        rec.update(_parse_gc(GC_LOG, t0 - jvm_start, t1 - jvm_start))
        out.append(rec)
        print(json.dumps(rec), flush=True)
    secs = sorted(r["sec"] for r in out)
    summary = {
        "lever": lever or "base",
        "min": secs[0],
        "max": secs[-1],
        "spread_pct": round(100.0 * (secs[-1] - secs[0]) / secs[0], 1),
        "wall_delta_max_min": round(secs[-1] - secs[0], 2),
        "gc_delta_max_min": (
            round(
                max(r["gc_pause_sec"] or 0 for r in out)
                - min(r["gc_pause_sec"] or 0 for r in out),
                2,
            )
        ),
    }
    print(json.dumps({"summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
