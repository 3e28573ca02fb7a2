"""Shared bench-tooling helpers."""

from __future__ import annotations

import time


def cpu_burn(spark, seconds: float = 5.0) -> float:
    """Spin every executor core for ~``seconds`` before the first timed
    region (VERDICT r06 task 4).

    What this buys, per the round-7 measurement (SURVEY §6): on THIS host
    there is provably no machine-level idle ramp (a fixed all-core job
    profiles identically from a 12-min-idle box and a hot one), so the
    burn's real value is executor-thread + codegen-infrastructure warmup
    in the fresh JVM, plus cheap insurance against environments that DO
    throttle from idle (laptops, burstable cloud instances).

    The burn is a CPU-dense Spark job (sha2 over a generated range, one
    partition per core), NOT a Python-thread spin — the GIL serializes
    Python threads onto one core, while the JVM job saturates all of
    them and additionally warms the JIT on real codegen paths. Returns
    the actual burn duration."""
    t0 = time.monotonic()
    deadline = t0 + seconds
    cores = spark.sparkContext.defaultParallelism
    while time.monotonic() < deadline:
        # ~1-2s per pass on 32 cores; loop to fill the budget
        spark.range(0, 32_000_000, 1, cores * 2).selectExpr(
            "count(sha2(cast(id as string), 256)) as n"
        ).collect()
    return round(time.monotonic() - t0, 2)
