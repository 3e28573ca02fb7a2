"""Sink connectors — full-table export (reference parity: dump_db.py).

The reference dumps the unified Postgres table to one CSV with a psycopg2
cursor loop. Spark-first: `DataFrame.write` with an explicit format —
distributed, restartable, and partitionable. `single_file=True` reproduces
the reference's one-file contract (coalesce(1) — driver-light, but the
write itself is still an executor task); at 100 TB you never do that, you
write partitioned parquet/csv and let the consumer glob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def export_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def export_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


# ── manifest-checked dataset publish ────────────────────────────────────────
# A training-data release is only usable if consumers can TRUST the shards:
# the manifest records per-partition row counts and an order-insensitive
# content hash, computed distributively in the same pass family as the
# write. `verify_manifest` re-reads the published files and recomputes —
# the "did the copy/transfer/compaction lose rows" check that every
# 100 TB publish step needs. (Reference analog: the processed-file ledger
# with md5 identity, extract_commoncrawl.py:89-93, promoted to a
# per-partition contract.)

MANIFEST_NAME = "_MANIFEST.json"


def _partition_stats(df: DataFrame, partition_by: list[str]) -> dict:
    from pyspark.sql import functions as F

    # order-insensitive content hash: sum of per-row crc32 over all columns
    # in NAME order (a re-read moves partition columns to the end, so
    # positional order is not stable), independent of partition layout and
    # task scheduling
    row_hash = F.crc32(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(df.columns)])
    )
    rows = (
        df.groupBy(*partition_by)
        .agg(F.count("*").alias("rows"), F.sum(row_hash).alias("content_hash"))
        .collect()
    )
    return {
        "|".join(str(r[c]) for c in partition_by): {
            "rows": r["rows"],
            "content_hash": int(r["content_hash"]),
        }
        for r in rows
    }


def export_with_manifest(df: DataFrame, path: str, partition_by: list[str]) -> dict:
    """Write partitioned parquet + a `_MANIFEST.json` of per-partition row
    counts and content hashes. Returns the manifest dict."""
    import json
    import os

    export_parquet(df, path, partition_by)
    manifest = {
        "partition_by": partition_by,
        "columns": sorted(df.columns),
        "partitions": _partition_stats(df, partition_by),
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_manifest(spark, path: str) -> dict:
    """Re-read a published dataset and recompute the manifest; returns
    {"ok": bool, "mismatches": [partition, ...]} — the post-transfer /
    post-compaction integrity check."""
    import json
    import os

    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    back = spark.read.parquet(path)
    actual = _partition_stats(back, manifest["partition_by"])
    expected = manifest["partitions"]
    mismatches = sorted(
        k
        for k in set(expected) | set(actual)
        if expected.get(k) != actual.get(k)
    )
    return {"ok": not mismatches, "mismatches": mismatches}
