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


def export_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (built into Spark): the columnar alternative for Hive-side
    consumers; same pushdown/pruning posture as parquet."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


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
    import json

    row_hash = F.crc32(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(df.columns)])
    )
    rows = (
        df.groupBy(*partition_by)
        .agg(F.count("*").alias("rows"), F.sum(row_hash).alias("content_hash"))
        .collect()
    )
    # manifest keys are canonical JSON arrays of the partition values: a
    # joined-string key is ambiguous the moment a value contains the
    # separator (('x','y|z') and ('x|y','z') collided under '|', silently
    # overwriting one partition's stats; compaction's key.split also broke
    # on any value containing the separator)
    return {
        json.dumps([str(r[c]) for c in partition_by]): {
            "rows": r["rows"],
            "content_hash": int(r["content_hash"]),
        }
        for r in rows
    }


def _dump_json_atomic(path: str, obj: dict) -> None:
    """write-tmp + os.replace: a crash can leave the old file or the new
    one, never a truncated-but-unparseable manifest (the torn-write class
    the serving crash-point fuzz exposed in _SNAPSHOT.json — an in-place
    `open(path, "w")` truncates BEFORE json.dump writes)."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        # flush+fsync before the rename: os.replace alone is atomic against
        # process crash, but on power loss some filesystems can persist the
        # rename before the data blocks — publishing an empty/torn file, the
        # exact class the crash fuzz closes for process crashes (ADVICE r08)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _parse_manifest_key(key: str, n_cols: int) -> list[str]:
    """Decode one manifest partition key to its value list. Keys are
    canonical JSON arrays; manifests written before that change used
    '|'-joined strings, and without a fallback every pre-change dataset
    becomes unverifiable/uncompactable (json.loads raises on 'x|y').
    Legacy fallback: anything that is not a JSON list of the right arity
    splits on '|' — values containing '|' were already ambiguous under
    the old scheme, so the fallback is exactly as good as the data it
    reads; the next export_with_manifest rewrites the keys canonically."""
    import json

    try:
        vals = json.loads(key)
        if isinstance(vals, list) and len(vals) == n_cols:
            return [str(v) for v in vals]
    except ValueError:
        pass
    return key.split("|")


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
    _dump_json_atomic(os.path.join(path, MANIFEST_NAME), manifest)
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
    part_cols = manifest["partition_by"]
    actual = _partition_stats(back, part_cols)
    # normalize stored keys through the legacy decoder so a pre-JSON-keys
    # manifest ('|'-joined) still verifies against the canonical recompute
    expected = {
        json.dumps(_parse_manifest_key(k, len(part_cols))): v
        for k, v in manifest["partitions"].items()
    }
    mismatches = sorted(
        k
        for k in set(expected) | set(actual)
        if expected.get(k) != actual.get(k)
    )
    return {"ok": not mismatches, "mismatches": mismatches}


def compact_dataset(spark, path: str, target_bytes: int = 128 << 20) -> dict:
    """Small-file compaction for a manifest-published dataset — the lake
    analog of the reference's VACUUM maintenance step
    (run_quality_checks.py:100-116), completing the C5 health report with
    the repair action it recommends.

    Rewrites every partition into ceil(partition_bytes / target_bytes)
    files of ~target size, then atomically swaps directories ONLY after
    `verify_manifest` proves the rewrite preserved every partition's row
    count and content hash (so a failed/partial compaction can never
    replace good data).

    Scale posture: file count per partition comes from the manifest's exact
    row counts (no driver listing of data rows), and rows are routed by
    repartition on (partition cols, salt) where salt = crc32(row) mod
    n_files — a 10-billion-row partition becomes n_files balanced writer
    tasks instead of one straggler, and output file count is bounded by
    construction (hash collisions between salt groups of one partition can
    only merge files, never fragment), not a maxRecordsPerFile heuristic.
    """
    import glob
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    # heal a compaction that died between the swap's two renames below
    # (no dataset at `path`, the good data stranded in `.precompact`) —
    # without this, every reader and this function's own manifest read
    # fail with FileNotFoundError forever. Same protocol as the serving
    # index heal (serving/http_api.py:heal_interrupted_compaction).
    old = path.rstrip("/") + ".precompact"
    if os.path.isdir(old):
        if not os.path.isdir(path):
            os.rename(old, path)
        else:  # crashed after the second rename, before cleanup
            shutil.rmtree(old)

    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    part_cols = manifest["partition_by"]

    files_before = glob.glob(os.path.join(path, *["*"] * len(part_cols), "*.parquet"))
    bytes_total = sum(os.path.getsize(p) for p in files_before)
    rows_total = sum(p["rows"] for p in manifest["partitions"].values()) or 1
    bytes_per_row = max(1.0, bytes_total / rows_total)
    rows_per_file = max(1, int(target_bytes / bytes_per_row))

    # exact per-partition target file counts from the manifest row counts
    # (keys are canonical JSON arrays, with the '|'-joined legacy fallback
    # — see _parse_manifest_key)
    plan_rows = [
        (*_parse_manifest_key(key, len(part_cols)), -(-stats["rows"] // rows_per_file))
        for key, stats in manifest["partitions"].items()
    ]
    plan = spark.createDataFrame(
        plan_rows, ", ".join(f"{c} string" for c in part_cols) + ", n_files long"
    )

    df = spark.read.parquet(path)
    # partition columns read back typed; join on their string form to match
    # the manifest's key encoding
    join_on = [df[c].cast("string") == plan[c] for c in part_cols]
    salt = F.pmod(
        F.crc32(F.concat_ws("\x1f", *[df[c].cast("string") for c in sorted(df.columns)])),
        F.col("n_files"),
    ).alias("_salt")
    routed = df.join(F.broadcast(plan), join_on).select(
        *[df[c] for c in df.columns], salt
    )

    tmp = path.rstrip("/") + ".compacting"
    # explicit partition count: the planned total file count. Without it,
    # AQE coalesces the shuffle (it only sees bytes, not the files-per-
    # directory contract) and a coalesced task writes one oversized file
    # per partition dir it holds — exactly the layout being repaired.
    total_files = int(sum(r[-1] for r in plan_rows))
    (
        routed.repartition(total_files, *[F.col(c) for c in part_cols], F.col("_salt"))
        .drop("_salt")
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(tmp)
    )
    shutil.copy(os.path.join(path, MANIFEST_NAME), os.path.join(tmp, MANIFEST_NAME))

    check = verify_manifest(spark, tmp)
    if not check["ok"]:
        shutil.rmtree(tmp)
        raise RuntimeError(f"compaction dropped data, aborted: {check['mismatches']}")

    old = path.rstrip("/") + ".precompact"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = glob.glob(os.path.join(path, *["*"] * len(part_cols), "*.parquet"))
    return {
        "files_before": len(files_before),
        "files_after": len(files_after),
        "rows_per_file": rows_per_file,
        "ok": True,
    }


# ── WebDataset-style tar-shard sink ─────────────────────────────────────────
# The delivery format large multimodal training runs actually consume
# (the public WebDataset convention: N tar shards, each sample a group of
# `{key}.{ext}` member files, loaders stream shards sequentially). The
# reference's CSV dump is the analyst export; THIS is the trainer export.
#
# Scale posture: shard assignment is the N6 deterministic-hash discipline
# (crc32(key) % n_shards — reproducible, uniform by construction, no RNG);
# each executor task writes whole tar files for the shard ids hash-routed
# to it, so writers never contend on a shard. Members are key-sorted
# within each shard — the byte layout is a pure function of the data. In
# local mode shards land on the shared path directly; on a cluster the
# same writer targets task-local disk + upload, the standard webdataset
# writer shape.


def export_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    members: dict[str, str],
    n_shards: int = 8,
) -> dict:
    """Write ``df`` as WebDataset-style tar shards.

    ``members`` maps member file extension → column name, e.g.
    ``{"txt": "text", "json": "meta"}``: each row becomes the sample
    ``{key}.{ext}`` files inside its shard. String columns are written
    utf-8, binary columns raw; struct/map/array and scalar non-string
    columns are serialized as canonical JSON (sorted keys — NOT Python
    repr), so a ``.json`` member is always loadable by json.loads.
    ``key_col`` values must be unique — duplicate keys would write
    same-named tar members that loaders silently merge, so the write
    fails loudly instead. Returns ``{"n_shards", "samples"}`` and
    writes a ``_WDS_MANIFEST.json`` of per-shard sample counts."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    dup = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        raise ValueError(
            f"export_webdataset: key_col {key_col!r} is not unique — duplicate "
            f"keys {[r[key_col] for r in dup]} would produce same-named tar "
            "members that loaders silently merge"
        )
    os.makedirs(path, exist_ok=True)
    # Invalidate the manifest FIRST (absent-on-crash discipline, VERDICT
    # r09): the manifest is the loader's read gate, published last and
    # atomically below — removing it before any shard bytes change means
    # every crash state of this writer leaves NO manifest, so
    # iter_webdataset refuses loudly instead of streaming torn/stale
    # shards against a stale shard list.
    mpath = os.path.join(path, "_WDS_MANIFEST.json")
    if os.path.exists(mpath):
        os.remove(mpath)
    for stale in glob.glob(os.path.join(path, "shard-*.tar")):
        os.remove(stale)  # a smaller n_shards must not leave orphan shards
    exts = sorted(members)
    cols = [key_col] + [members[e] for e in exts]
    routed = (
        df.select(*cols)
        .withColumn("_shard", F.pmod(F.crc32(F.col(key_col).cast("string")), F.lit(n_shards)))
        .repartition(n_shards, F.col("_shard"))
        .sortWithinPartitions("_shard", key_col)
    )

    def _member_bytes(v):
        """bytes raw, str utf-8, anything structured → canonical JSON
        (Rows become dicts recursively; sorted keys ⇒ deterministic bytes)."""
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, str):
            return v.encode()
        if hasattr(v, "asDict"):  # pyspark Row
            v = v.asDict(recursive=True)
        return json.dumps(v, sort_keys=True, default=str).encode()

    def _write_partition(rows):
        import tarfile

        tar = None
        cur = None
        counts: dict[int, int] = {}
        for r in rows:
            sid = r["_shard"]
            if sid != cur:  # rows arrive shard-grouped (sorted within partition)
                if tar is not None:
                    tar.close()
                cur = sid
                tar = tarfile.open(os.path.join(path, f"shard-{sid:05d}.tar"), "w")
            for ext in exts:
                data = _member_bytes(r[members[ext]])
                info = tarfile.TarInfo(name=f"{r[key_col]}.{ext}")
                info.size = len(data)
                info.mtime = 0  # deterministic bytes: no wall-clock in headers
                import io

                tar.addfile(info, io.BytesIO(data))
            counts[sid] = counts.get(sid, 0) + 1
        if tar is not None:
            tar.close()
        # per-shard counts come from the writers themselves — re-reading
        # and untarring the whole published dataset through the driver just
        # to count samples would double the export's I/O and serialize it
        yield from counts.items()

    pairs = routed.rdd.mapPartitions(_write_partition).collect()
    manifest = {
        "n_shards": n_shards,
        "samples": int(sum(n for _, n in pairs)),
        "members": exts,
        "per_shard": {f"shard-{int(sid):05d}.tar": int(n) for sid, n in pairs},
    }
    _dump_json_atomic(mpath, manifest)
    return manifest


def iter_webdataset(path: str):
    """Stream samples back from a tar-shard directory: yields
    ``(key, {ext: bytes, "_shard_file": name})`` in shard/member order —
    the loader-side contract, and the read-back verifier the tests use.

    Manifest-gated (VERDICT r09): the writer publishes ``_WDS_MANIFEST.json``
    last and atomically, and removes it before touching any shard bytes, so
    a missing manifest means a crashed or in-progress export — the loader
    REFUSES rather than yielding torn samples. The on-disk shard set must
    match the manifest exactly (a half-cleaned dir with stale extra shards,
    or one with shards missing, is a loud error), and each shard's streamed
    sample count is checked against the manifest's per-shard count at shard
    end, so a valid-tar-but-wrong-content swap cannot pass silently."""
    import glob
    import json
    import os
    import tarfile

    mpath = os.path.join(path, "_WDS_MANIFEST.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"iter_webdataset: no _WDS_MANIFEST.json in {path!r} — the writer "
            "publishes the manifest last, so this is an unfinished/crashed "
            "export (or not a webdataset dir); refusing to stream unverified "
            "shards. Re-run export_webdataset to heal."
        )
    with open(mpath) as f:
        per_shard = json.load(f)["per_shard"]
    on_disk = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(path, "shard-*.tar"))
    )
    if on_disk != sorted(per_shard):
        missing = sorted(set(per_shard) - set(on_disk))
        stale = sorted(set(on_disk) - set(per_shard))
        raise ValueError(
            f"iter_webdataset: shard files do not match _WDS_MANIFEST.json "
            f"(missing={missing}, unexpected={stale}) — half-cleaned or "
            "partially-rewritten export; re-run export_webdataset to heal"
        )
    for base in on_disk:
        shard = os.path.join(path, base)
        n_samples = 0
        with tarfile.open(shard) as tar:
            current: dict | None = None
            cur_key = None
            for m in tar:
                key, ext = m.name.rsplit(".", 1)
                if key != cur_key:
                    if current is not None:
                        yield cur_key, current
                        n_samples += 1
                    cur_key, current = key, {"_shard_file": base}
                current[ext] = tar.extractfile(m).read()
            if current is not None:
                yield cur_key, current
                n_samples += 1
        if n_samples != per_shard[base]:
            raise ValueError(
                f"iter_webdataset: {base} streamed {n_samples} samples but "
                f"_WDS_MANIFEST.json records {per_shard[base]} — torn or "
                "substituted shard; re-run export_webdataset to heal"
            )


# ── JDBC sink (reference terminal-store parity) ─────────────────────────────
# The reference's terminal store is Postgres, loaded with driver-side
# psycopg2 execute_values batches and ON CONFLICT DO NOTHING
# (extract_abr.py:57-66, docker-compose.yml). Spark-first: every executor
# opens its own connection and streams its partition through batched
# INSERTs — N_partitions parallel writers instead of one driver loop.
# Unverifiable end-to-end in this sandbox (no JDBC server, no driver jar);
# the option-assembly contract below is what the tests pin.

#: Spark's JDBC writer has no native upsert — append/overwrite only. The
#: reference's ON CONFLICT DO NOTHING posture maps to the two-step lake
#: pattern: `to_jdbc(df, ..., table="staging_x", mode="overwrite")` then a
#: single driver-side `INSERT ... SELECT ... ON CONFLICT DO NOTHING` from
#: staging to target — the MERGE runs in the database, where it is one
#: statement, not a per-row round trip.
JDBC_DEFAULT_BATCHSIZE = 10_000
JDBC_DEFAULT_ISOLATION = "READ_COMMITTED"


def jdbc_options(
    url: str,
    table: str,
    batchsize: int = JDBC_DEFAULT_BATCHSIZE,
    isolation_level: str = JDBC_DEFAULT_ISOLATION,
    num_partitions: int | None = None,
    truncate: bool = False,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the `spark.write.format("jdbc")` option map (pure, testable).

    - ``batchsize``: rows per executeBatch round trip — the Spark analog of
      the reference's execute_values page size.
    - ``isolationLevel``: transaction isolation of each writer task's
      connection (NONE/READ_COMMITTED/.../SERIALIZABLE).
    - ``numPartitions``: cap on concurrent connections; a 1000-executor
      cluster must not open 1000 sessions against one Postgres — repartition
      down to the database's connection budget before the write.
    - ``truncate``: with mode="overwrite", TRUNCATE instead of DROP+CREATE
      so indexes/grants survive.
    """
    if batchsize < 1:
        raise ValueError(f"batchsize must be >= 1, got {batchsize}")
    allowed = {"NONE", "READ_UNCOMMITTED", "READ_COMMITTED", "REPEATABLE_READ", "SERIALIZABLE"}
    if isolation_level not in allowed:
        raise ValueError(f"isolationLevel {isolation_level!r} not in {sorted(allowed)}")
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
        "truncate": str(truncate).lower(),
    }
    if num_partitions is not None:
        if num_partitions < 1:
            raise ValueError(f"numPartitions must be >= 1, got {num_partitions}")
        opts["numPartitions"] = str(num_partitions)
    if driver:
        opts["driver"] = driver
    for k, v in (properties or {}).items():
        opts[str(k)] = str(v)
    return opts


def to_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    **kwargs,
) -> None:
    """Write ``df`` to a JDBC table with the batched-writer posture above.

    ``kwargs`` pass through to :func:`jdbc_options`. Modes: append /
    overwrite / ignore / error (upsert: see module note — stage + one
    in-database MERGE)."""
    if mode not in {"append", "overwrite", "ignore", "error", "errorifexists"}:
        raise ValueError(f"unsupported mode {mode!r}")
    writer = df.write.format("jdbc").mode(mode)
    for k, v in jdbc_options(url, table, **kwargs).items():
        writer = writer.option(k, v)
    writer.save()
