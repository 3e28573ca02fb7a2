"""HTTP lookup service over a Spark-published parquet snapshot.

Reference parity: the reference serves point lookups from its terminal
Postgres store via FastAPI (fastapi_service/main.py:15-59 — GET
/companies/{abn}, /companies/search, /companies/by_state). Spark-first,
the same component splits into the two halves a lakehouse deployment
actually has:

1. **Publish** (`snapshot_tables`): Spark writes the serving snapshot —
   the batch engine's output IS the serving store, refreshed per ETL run
   exactly like the reference's Postgres load. The write is verified by
   re-read (row count + order-insensitive content hash per table, the A9
   manifest discipline) before the server ever points at it.
2. **Serve** (`make_server`): a thin stdlib HTTP front end whose routes
   are the D1-D6 plan functions (plans/api.py) run against the snapshot —
   the SAME parameterized plans the correctness gate proves against the
   DuckDB oracles, so route semantics are gate-checked by construction.

Scale posture: every route is a pushed-down point/top-k plan (keyset
pagination D4, broadcast dim joins D1/D3, sort-limit top-k D5/D6), never
an OFFSET walk or full collect. On a real cluster the snapshot lives in
object storage; latency-critical keys would additionally be fronted by a
key-value projection of the same snapshot — the routes and their
semantics (and this module's tests) stay identical. The stdlib server is
deliberately dependency-free (no FastAPI in the sandbox); it is the
protocol shim, not the engine.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from australian_company_etl_spark.plans import api as api_plans
from australian_company_etl_spark.sources.registry import load_tables, table_path

#: tables the D-family routes read; the snapshot contains exactly these.
SERVING_TABLES = ["customer", "nation", "part", "documents"]

MAX_PAGE_SIZE = 1000  # serving-side cap: a page is a page, not an export

FULLTEXT_INDEX = "fulltext_index"
#: doc ledger beside the full-text index: one row per indexed doc_id. It —
#: not the posting rows — is the membership authority for incremental
#: maintenance, so a document with ZERO tokens is still remembered and its
#: re-delivery is a no-op (posting rows alone can't represent it), and
#: n_docs (idf's denominator) is always exactly the ledger count. At 100 TB
#: this is the processed-doc ledger a Bloom filter (M3) fronts.
FULLTEXT_DOCS = "fulltext_docs"
#: sharded posting segments beside the flat index (r12): one row per
#: (tok, shard) carrying doc_id-sorted arrays — the bounded-row form the
#: H12 docstring promises past ~1e6 docs/token, served under /search?shard=1
FULLTEXT_SHARDED = "fulltext_sharded"
#: doc_ids per shard segment; small locally so gate corpora produce real
#: multi-shard tokens — at scale pick ~1e5-1e6 (segment row ≈ one row group)
FT_SHARD_DOCS = 100


@contextlib.contextmanager
def _index_lock(path: str, timeout: float = 60.0):
    """Advisory mutual exclusion between index APPENDERS and COMPACTION.

    ``compact_index`` rewrites from a point-in-time file listing and swaps
    directories; a posting batch appended between that listing and the swap
    would silently vanish with the old directory (scripts/maintain_index.py
    documents cron-pairing frequent 'stream' with periodic 'compact', so
    overlap IS the deployment shape). Both sides therefore hold this lock:
    appenders for their read-membership → write → manifest window,
    compaction for its delta re-diff + directory swap (its long rewrite
    phase runs UNLOCKED; files appended meanwhile are detected by the
    re-diff and carried into the new layout verbatim).

    Mechanics: flock(LOCK_EX) on a lock file beside the index. The kernel
    releases the lock when the holder dies — any death, including kill -9
    between any two instructions — so there is NO stale-lock state and no
    liveness-probe protocol to race on (an earlier create-O_EXCL +
    dead-pid-break scheme let two contenders both "break" one stale file
    and both enter). The lock file itself persists; its pid content is
    informational only. flock is a same-host primitive, which is the
    single-driver deployment here; on a multi-host object store this
    becomes the table-format commit protocol (a catalog/conditional-put
    lock, as Delta/Iceberg do) — same protocol shape, different primitive.
    """
    import fcntl

    lock = path.rstrip("/") + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_WRONLY, 0o644)
    deadline = time.monotonic() + timeout
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"index lock {lock} held by a live process for >{timeout}s"
                    ) from None
                time.sleep(0.05)
        os.ftruncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())
        yield
    finally:
        # closing the fd releases the flock atomically with process exit
        # semantics; the file stays behind as a harmless mailbox
        os.close(fd)


def _write_manifest(manifest_path: str, manifest: dict) -> None:
    """Atomic manifest publish: write a sibling tmp file, then os.replace.
    The previous in-place `open(path, "w")` + json.dump TRUNCATED the live
    manifest before writing — a crash between the truncate and the dump
    (found by the crash-point fuzz suite) left an empty `_SNAPSHOT.json`
    that every later append, probe, and /health read died on FOREVER
    (json.load raises, and nothing can rebuild the non-derivable table
    digests the manifest carries). rename/replace is atomic on POSIX, so
    every crash point now leaves either the old or the new manifest —
    never a torn one."""
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        # fsync before the rename: without it, power loss can publish the
        # rename ahead of the data blocks on some filesystems — an empty
        # manifest despite the atomic replace (ADVICE r08)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path)


def heal_interrupted_compaction(path: str, clean_tmp: bool = False) -> str | None:
    """Recover an index directory from a compaction that died mid-swap.

    The swap is two renames (live → .precompact, .compacting → live), NOT
    atomic as a unit: a crash between them leaves no live directory, with
    the good data stranded in ``.precompact``. Called on server startup,
    at the head of every compaction, and by the appenders under their
    lock, this rolls that window back (restore ``.precompact`` as live —
    always correct: it is byte-identical to the pre-compaction index plus
    nothing, and appends are excluded by the lock).

    ``clean_tmp`` additionally discards a leftover ``.compacting`` rewrite
    — pass it ONLY from `compact_index` itself (which must not run
    concurrently with another compaction of the same index): to every
    other caller a ``.compacting`` dir may be a LIVE compaction's
    in-flight rewrite, and deleting it would destroy that work. Leaving
    an orphan is safe — the next compaction's mode-overwrite rewrite
    replaces it wholesale; the flag exists to reclaim the disk. Returns
    a short action tag for logging/tests, or None if nothing needed
    healing."""
    import shutil

    old = path.rstrip("/") + ".precompact"
    tmp = path.rstrip("/") + ".compacting"
    action = None
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
            action = "rolled_back"
        else:
            # crashed after the second rename, before cleanup
            shutil.rmtree(old)
            action = "cleaned_precompact"
    if clean_tmp and os.path.exists(tmp):
        shutil.rmtree(tmp)
        action = action or "cleaned_compacting"
    return action


def _doc_postings(docs: DataFrame) -> DataFrame:
    from australian_company_etl_spark.functions.textfns import tokens_all_spark

    toks = docs.select("doc_id", F.explode(tokens_all_spark(F.col("text"))).alias("tok"))
    return toks.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))


def _drop_ledgers_before_rebuild(data_dir: str, names: tuple[str, ...]) -> None:
    """Rename-away + delete derived ledger directories BEFORE a build
    overwrites the postings they describe (ADVICE r7). The build paths used
    to write the probe-stat ledgers AFTER the postings overwrite, so a
    crash in between left a stale-but-READABLE ledger whose min_n_trgm
    could exceed (or max_tf undercut) the new corpus's values — exactly
    the soundness violation the append path's write-stats-first ordering
    and the compaction's absent-on-crash swap exclude. Dropping them first
    makes every crash state ABSENT (probe declines, appenders skip,
    compaction rebuilds) instead of stale. The rename is atomic; a crash
    mid-rmtree leaves only the ignored `.stale` orphan, reclaimed on the
    next build."""
    import shutil

    for name in names:
        path = table_path(data_dir, name)
        stale = path.rstrip("/") + ".stale"
        if os.path.exists(stale):
            shutil.rmtree(stale)
        if os.path.exists(path):
            os.rename(path, stale)
            shutil.rmtree(stale)


def build_fulltext_index(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 8
) -> dict:
    """Publish the full-text SERVING INDEX next to the snapshot: one
    posting row per (tok, doc_id) with its tf — so a query probes
    O(matched postings) instead of re-tokenizing the corpus per request
    (the H12 'serving form swaps the scan for the index' promise, made
    runnable).

    The layout is deliberately APPEND-ONLY: df is NOT denormalized onto
    the rows — the probe derives each query term's df by counting its own
    matched postings (exact: the term filter keeps every posting of a
    matched term), and the corpus size lives in the snapshot manifest. A
    daily ingest therefore maintains the index by appending the new
    batch's postings and bumping n_docs — never rewriting existing rows
    (`append_documents_to_index`), the same archive-once dataflow as the
    incremental dedup/sketch operators (F12/M6).

    The initial build is range-partitioned and sorted by tok, so parquet
    row-group min/max stats prune every file a query's terms don't touch
    — the GIN-index analog at 100 TB; appended batches are term-pruned by
    footer stats per file and restored to fully-sorted layout by
    `compact_index` (digest-verified rewrite + atomic swap).

    ``n_files`` sizes the sorted layout: the local default (8) suits the
    test corpora; at scale pick postings_bytes / ~128 MB so each file is
    one well-sized contiguous key range (the same sizing rule as
    compact_dataset's target_bytes).
    Returns {"rows": postings, "n_docs": corpus size}."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    tf = _doc_postings(docs)
    path = table_path(out_dir, FULLTEXT_INDEX)
    # stats first ABSENT, then postings, then stats rewritten: a crash
    # anywhere leaves no stale ledger describing the wrong corpus. The doc
    # ledger is dropped too — absent reads as a pre-ledger snapshot and the
    # append path backfills it once from the index's distinct doc_ids,
    # which is strictly better than a stale ledger asserting membership
    # for documents the new postings no longer contain.
    _drop_ledgers_before_rebuild(out_dir, (FULLTEXT_STATS, FULLTEXT_DOCS))
    tf.repartitionByRange(n_files, "tok").sortWithinPartitions("tok").write.mode(
        "overwrite"
    ).parquet(path)
    ledger = docs.select("doc_id").distinct()
    ledger.write.mode("overwrite").parquet(table_path(out_dir, FULLTEXT_DOCS))
    n_docs = spark.read.parquet(table_path(out_dir, FULLTEXT_DOCS)).count()
    _write_fulltext_stats(spark, spark.read.parquet(path), out_dir, mode="overwrite")
    return {"rows": spark.read.parquet(path).count(), "n_docs": n_docs}


def _shard_segments(tf: DataFrame, shard_docs: int) -> DataFrame:
    """(tok, doc_id, tf) postings → (tok, shard_id, doc_ids, tfs, seg_df)
    SEGMENT rows, shard_id = doc_id div shard_docs: a stop-word token's
    single unbounded posting run becomes ⌈N/shard_docs⌉ bounded rows.
    Within a segment the arrays are doc_id-sorted; ACROSS segments order
    is shard_id order (the shard function is monotone), and a consumer
    treats multiple segment rows per (tok, shard) as ADDITIVE — append
    batches create new rows, never rewrites, so the structure feeds the
    same archive-once append dataflow as the flat index."""
    arr = F.array_sort(F.collect_list(F.struct("doc_id", "tf")))
    return (
        tf.withColumn("shard_id", (F.col("doc_id") / shard_docs).cast("bigint"))
        .groupBy("tok", "shard_id")
        .agg(
            F.transform(arr, lambda s: s["doc_id"]).alias("doc_ids"),
            F.transform(arr, lambda s: s["tf"]).alias("tfs"),
            F.count("*").cast("long").alias("seg_df"),
        )
    )


def build_fulltext_index_sharded(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    shard_docs: int = FT_SHARD_DOCS,
    n_files: int = 8,
) -> dict:
    """Publish the SHARDED full-text index (VERDICT r11 task 7 — the H12
    docstring's past-1e6-docs/token form, runnable): posting SEGMENTS per
    (tok, shard) instead of one row per (tok, doc). Same information as
    the flat index — `/search?shard=1` serves from it through the
    identical scoring plan (segments exploded back to postings at probe
    time, term filter still pushed into the tok-sorted scan) and is proven
    row-identical to the flat probe in tests on a crafted hot-token
    corpus. At 100 TB each segment row is one bounded row-group write,
    and an ingest batch's segments append without touching existing rows."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    seg = _shard_segments(_doc_postings(docs), shard_docs)
    path = table_path(out_dir, FULLTEXT_SHARDED)
    seg.repartitionByRange(n_files, "tok").sortWithinPartitions(
        "tok", "shard_id"
    ).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    return {"rows": n, "shard_docs": shard_docs}


def append_documents_to_sharded(
    spark: SparkSession, new_docs: DataFrame, data_dir: str, shard_docs: int | None = None
) -> dict:
    """Append an ingest batch's posting segments to the sharded index —
    the library-variant feed into the serving append path: new (tok,
    shard) segment rows are ADDED (a batch sharing a shard with existing
    rows yields a second additive segment row — the probe unions them, so
    df and scores stay exact without any read-modify-write). Membership
    dedup against the doc ledger is the flat append path's job; this
    writer assumes ``new_docs`` is already the fresh set (call it from
    the same maintenance batch, after the ledger anti-join)."""
    path = table_path(data_dir, FULLTEXT_SHARDED)
    if shard_docs is None:
        shard_docs = FT_SHARD_DOCS
    seg = _shard_segments(_doc_postings(new_docs), shard_docs)
    if seg.isEmpty():
        return {"segments_appended": 0}
    seg.repartitionByRange(2, "tok").sortWithinPartitions("tok", "shard_id").write.mode(
        "append"
    ).parquet(path)
    return {"segments_appended": spark.read.parquet(path).count()}


def append_documents_to_index(
    spark: SparkSession, new_docs: DataFrame, data_dir: str
) -> dict:
    """Incremental index maintenance: append the NEW documents' postings
    and bump the manifest's n_docs — existing rows are never rewritten.
    First-wins at BOTH granularities (the J8 upsert discipline): duplicate
    doc_ids WITHIN the batch collapse to one row before anything else, and
    doc_ids already in the ledger are anti-joined away — so a retried or
    self-duplicating batch cannot inflate df, tf, or n_docs. Membership is
    decided against the `fulltext_docs` LEDGER, not the posting rows: a
    token-less document leaves no postings but IS recorded in the ledger,
    so its re-delivery is a no-op and n_docs (idf's denominator) stays the
    exact ledger count.

    CRASH SAFETY: the postings append and the ledger append are two
    parquet writes with no shared transaction, so each write's freshness
    is decided against its OWN table — postings against the posting rows,
    ledger against the ledger. A crash between the two (the exact window
    an at-least-once foreachBatch replay re-enters) then heals instead of
    corrupting: the replay finds the postings already present (skips
    them, no doubled tf) and appends only the missing ledger rows.

    Holds the index lock for the whole read-membership → write → manifest
    window: without it a concurrent `compact_index` swap could replace the
    directory between this function's listing and its append, stranding
    the appended files in the swapped-out copy (`_index_lock`).
    Returns what was appended (ledger granularity)."""
    path = table_path(data_dir, FULLTEXT_INDEX)
    ledger_path = table_path(data_dir, FULLTEXT_DOCS)
    new_docs = new_docs.dropDuplicates(["doc_id"])
    with _index_lock(path):
        heal_interrupted_compaction(path)
        # the doc ledger swaps during fulltext compaction too — heal it
        # BEFORE the exists-check below, or a mid-swap crash would look
        # like a pre-ledger snapshot and the postings backfill would lose
        # every token-less doc's membership
        heal_interrupted_compaction(ledger_path)
        if not os.path.exists(ledger_path):
            # pre-ledger snapshot (postings only, published before the
            # ledger existed): backfill it ONCE from the index's distinct
            # doc_ids — exactly the old postings-anti-join membership
            # source, so migration changes no append decision. (Token-less
            # docs were unrepresentable in that layout; nothing to recover.)
            spark.read.parquet(path).select("doc_id").distinct().write.parquet(
                ledger_path
            )
        in_ledger = spark.read.parquet(ledger_path).select("doc_id")
        fresh = new_docs.join(in_ledger, "doc_id", "left_anti")
        n_new = fresh.count()
        if n_new:
            # ledger lags postings only inside the crash window (postings are
            # written first), so the postings-membership probe runs on the
            # not-yet-ledgered remainder alone; a clean re-delivery never
            # scans the index at all. At 100 TB a Bloom filter (M3) fronts
            # this probe, same semantics.
            in_postings = spark.read.parquet(path).select("doc_id").distinct()
            postings_new = _doc_postings(fresh.join(in_postings, "doc_id", "left_anti"))
            # local persist (maintenance job, not the query-scoped tracker):
            # the batch postings feed up to two writes, and the stats ledger
            # must describe the SAME rows as the postings append — and the
            # postings append invalidates every cached plan that scans the
            # index path, including this batch's anti-join.
            postings_new = postings_new.persist()
            try:
                if not postings_new.isEmpty():  # token-less docs append no postings
                    # probe-stat ledger maintained only for snapshots that
                    # have one (older snapshots keep working; the max-df
                    # probe just declines there). Written BEFORE the
                    # postings: a crash in between leaves df/max_tf
                    # inflated, which the probe's bound tolerates — the
                    # reverse order could leave max_tf UNDER the indexed
                    # max, breaking the exactness guard.
                    if os.path.exists(table_path(data_dir, FULLTEXT_STATS)):
                        _write_fulltext_stats(spark, postings_new, data_dir, mode="append")
                    postings_new.repartitionByRange(2, "tok").sortWithinPartitions(
                        "tok"
                    ).write.mode("append").parquet(path)
            finally:
                postings_new.unpersist()
            fresh.select("doc_id").write.mode("append").parquet(ledger_path)
        manifest_path = os.path.join(data_dir, "_SNAPSHOT.json")
        with open(manifest_path) as f:
            manifest = json.load(f)
        manifest[FULLTEXT_INDEX]["n_docs"] = spark.read.parquet(ledger_path).count()
        manifest[FULLTEXT_INDEX]["rows"] = spark.read.parquet(path).count()
        _write_manifest(manifest_path, manifest)
    return {"docs_appended": n_new, "n_docs": manifest[FULLTEXT_INDEX]["n_docs"]}


def _run_maintenance_stream(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    append_fn,
    max_files: int,
    checkpoint_dir: str | None,
) -> int:
    """Shared streaming shell for index maintenance: one foreachBatch
    append per micro-batch of newly-landed files, availableNow trigger.
    Returns the number of micro-batches processed in THIS invocation."""
    n_batches = 0

    def _append(batch: DataFrame, _batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        append_fn(batch)

    writer = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
        .writeStream.foreachBatch(_append)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return n_batches


def run_index_maintenance_stream(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    data_dir: str,
    max_files: int = 1,
    checkpoint_dir: str | None = None,
) -> int:
    """Continuous index maintenance: stream newly-landed document files
    into the published index, one foreachBatch append per micro-batch —
    the serving-side twin of the incremental-dedup daily batch (F12).
    Pass ``checkpoint_dir`` to persist the stream's processed-file ledger:
    a restarted stream then resumes AFTER the files it already committed
    instead of reprocessing the whole landing directory. Re-delivered docs
    are additionally dropped by the append's first-wins ledger anti-join,
    so at-least-once delivery cannot inflate the index either way (the
    restart test proves interrupted-then-resumed == full rebuild)."""
    return _run_maintenance_stream(
        spark,
        src_dir,
        schema,
        # late-bound module lookup (not a direct reference): the restart
        # test injects failures by patching append_documents_to_index
        lambda batch: append_documents_to_index(batch.sparkSession, batch, data_dir),
        max_files,
        checkpoint_dir,
    )


def run_trigram_maintenance_stream(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    data_dir: str,
    max_files: int = 1,
    checkpoint_dir: str | None = None,
) -> int:
    """Trigram-index twin of `run_index_maintenance_stream`: stream
    newly-landed part files ((p_partkey, p_name) parquet) into the
    published trigram index with the same checkpointed, first-wins
    at-least-once contract."""
    return _run_maintenance_stream(
        spark,
        src_dir,
        schema,
        lambda batch: append_parts_to_trigram_index(batch.sparkSession, batch, data_dir),
        max_files,
        checkpoint_dir,
    )


TRIGRAM_INDEX = "trigram_index"
#: optional probe-cost statistics beside the trigram index, both APPEND-ONLY
#: ledgers (same dataflow as the postings): `trigram_stats` holds (trgm,
#: df_inc) rows — a trigram's document frequency is the SUM of its rows —
#: and `trigram_meta` holds (n_parts_inc, min_n_trgm) rows — corpus size is
#: the sum, the corpus-wide minimum distinct-trigram count is the min.
#: They exist solely for the max-df probe skip (`trigram_rank_maxdf`);
#: when absent or stale the probe falls back to the full plan, so they are
#: never a correctness dependency. Append ordering makes the guard SOUND
#: under crashes: both ledger rows are written BEFORE the postings, so a
#: crash in the window leaves min_n_trgm ≤ the true min (the guard's only
#: soundness input) and df/n_parts inflated — inflation only shifts the
#: hot/rare split and the fallback rate, never the served rows.
TRIGRAM_STATS = "trigram_stats"
TRIGRAM_META = "trigram_meta"
#: max-df probe declines when the rare-candidate upper bound (Σ df of the
#: rare query trigrams, from the stats ledger) exceeds this — the skip's
#: semi-join force-broadcasts the candidate keys, and ~500k bigint keys is
#: a conservative executor-memory-safe broadcast at any cluster size.
MAXDF_BROADCAST_CAP = 500_000

#: full-text analog of TRIGRAM_STATS: append-only (tok, df_inc, max_tf)
#: ledger beside the full-text index, written BEFORE each postings append
#: (same soundness argument — a crash inflates df/max_tf, and the max-df
#: probe's exactness bound only uses max_tf as an UPPER bound on any
#: indexed tf, so inflation can only cause declines, never wrong rows).
#: Unlike the doc ledger this is NO membership authority: every value in
#: it is derivable from the postings, so compaction REBUILDS it wholesale
#: from the compacted index instead of folding rows — which also heals
#: every torn/absent state for free. Optional perf structure: absent or
#: unreadable ⇒ the probe declines to the plain index plan.
FULLTEXT_STATS = "fulltext_stats"


def build_trigram_index(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 8
) -> int:
    """Publish the pg_trgm-analog inverted index: one row per
    (trgm, p_partkey) with the part's name and distinct-trigram count —
    everything D6's Jaccard ranking needs. trgm-sorted layout for the
    same row-group term pruning as the full-text index. Returns the
    posting-row count."""
    from australian_company_etl_spark.plans.api import _TRGM_EXPR

    part = load_tables(spark, sf_dir, ["part"])["part"]
    trg = part.select(
        "p_partkey",
        "p_name",
        F.explode(F.expr(_TRGM_EXPR.format(c="p_name"))).alias("trgm"),
    ).withColumn("n_trgm", F.count("*").over(Window.partitionBy("p_partkey")))
    path = table_path(out_dir, TRIGRAM_INDEX)
    # drop the probe-stat ledgers BEFORE overwriting the postings they
    # describe — a crash then leaves them absent (probe declines), never
    # stale over the new corpus (see _drop_ledgers_before_rebuild)
    _drop_ledgers_before_rebuild(out_dir, (TRIGRAM_STATS, TRIGRAM_META))
    (
        trg.repartitionByRange(n_files, "trgm")
        .sortWithinPartitions("trgm")
        .write.mode("overwrite")
        .parquet(path)
    )
    idx = spark.read.parquet(path)
    _write_trigram_stats(spark, idx, out_dir, mode="overwrite")
    return idx.count()


def _write_trigram_meta(spark: SparkSession, postings: DataFrame, data_dir: str, mode: str) -> None:
    """One (n_parts_inc, min_n_trgm) ledger row for a postings batch."""
    meta = postings.select("p_partkey", "n_trgm").distinct().agg(
        F.count("*").alias("n_parts_inc"),
        F.min("n_trgm").alias("min_n_trgm"),
    )
    meta.coalesce(1).write.mode(mode).parquet(table_path(data_dir, TRIGRAM_META))


def _write_trigram_df_stats(spark: SparkSession, postings: DataFrame, data_dir: str, mode: str) -> None:
    """(trgm, df_inc) ledger rows for a postings batch."""
    stats = postings.groupBy("trgm").agg(F.count("*").alias("df_inc"))
    stats.coalesce(1).write.mode(mode).parquet(table_path(data_dir, TRIGRAM_STATS))


def _rebuild_trigram_stats(spark: SparkSession, data_dir: str) -> dict:
    """Compaction-time wholesale REBUILD of the trigram probe-stat ledgers
    from the (just-compacted) postings index — every ledger value is
    derivable from the postings (df = count per trgm, n_parts = distinct
    parts, min_n_trgm = min over the stored per-part counts), so the
    rebuild is both the fold and the heal: torn, absent, and
    crash-inflated ledger states all converge to EXACT values here, and
    pre-stats snapshots gain the ledgers at their first compaction (the
    migration path), exactly like `_rebuild_fulltext_stats`. Caller holds
    the index lock (no concurrent appender can write ledger rows the swap
    below would drop). The per-ledger swap is write-tmp + rmtree + rename:
    a crash between them leaves that ledger ABSENT, which the probe treats
    as decline and appenders skip — so a READABLE ledger can never
    silently miss a batch. (The previous driver-side fold rewrote the
    ledgers IN PLACE with mode-overwrite, whose crash window leaves a
    present-but-torn dir that later appends keep feeding: min_n_trgm would
    then read as the minimum over post-crash batches only — ABOVE the true
    corpus minimum — silently breaking the max-df guard's soundness. It
    also raised TypeError on the NULL min_n_trgm a zero-trigram batch's
    meta row carries. Rebuilding from the index eliminates both.)"""
    import shutil

    idx = spark.read.parquet(table_path(data_dir, TRIGRAM_INDEX))
    parts = idx.select("p_partkey", "n_trgm").distinct()
    frames = (
        (TRIGRAM_STATS, idx.groupBy("trgm").agg(F.count("*").alias("df_inc"))),
        (
            TRIGRAM_META,
            parts.agg(
                F.count("*").alias("n_parts_inc"),
                F.min("n_trgm").alias("min_n_trgm"),
            ),
        ),
    )
    out = {}
    for name, df in frames:
        path = table_path(data_dir, name)
        tmp = path.rstrip("/") + ".rebuilding"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        n = spark.read.parquet(tmp).count()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        out[name] = n
    return out


def _write_trigram_stats(spark: SparkSession, postings: DataFrame, data_dir: str, mode: str) -> None:
    """Publish the max-df probe statistics for a postings batch (see
    TRIGRAM_STATS/TRIGRAM_META). Build-time path; the append path issues
    the same two writes before its postings append."""
    _write_trigram_meta(spark, postings, data_dir, mode)
    _write_trigram_df_stats(spark, postings, data_dir, mode)


def append_parts_to_trigram_index(
    spark: SparkSession, new_parts: DataFrame, data_dir: str
) -> dict:
    """Incremental trigram-index maintenance, mirror of
    `append_documents_to_index`: the stored rows carry only per-part
    state (n_trgm is local to its p_partkey), so appending a fresh
    batch's postings is exact — |∩| and |∪| at probe time see the new
    candidates immediately, existing rows never rewritten. First-wins on
    re-delivered p_partkeys AND on duplicates within one batch (the
    intra-batch dropDuplicates below — without it two same-key rows in a
    batch would both survive the anti-join and double every posting,
    inflating |∩| at probe time). Same lock discipline as the full-text
    appender: membership read → write → manifest under `_index_lock`, so
    a concurrent compaction swap cannot strand the appended files."""
    from australian_company_etl_spark.plans.api import _TRGM_EXPR

    path = table_path(data_dir, TRIGRAM_INDEX)
    new_parts = new_parts.dropDuplicates(["p_partkey"])
    with _index_lock(path):
        heal_interrupted_compaction(path)
        indexed = spark.read.parquet(path).select("p_partkey").distinct()
        fresh = new_parts.join(indexed, "p_partkey", "left_anti")
        n_new = fresh.count()
        if n_new:
            trg = fresh.select(
                "p_partkey",
                "p_name",
                F.explode(F.expr(_TRGM_EXPR.format(c="p_name"))).alias("trgm"),
            ).withColumn("n_trgm", F.count("*").over(Window.partitionBy("p_partkey")))
            # local persist (not the query-scoped tracker — this is a
            # maintenance job): the batch postings feed up to three writes,
            # and the meta/stats ledgers must describe the SAME rows as the
            # postings append
            trg = trg.persist()
            try:
                # a batch can yield ZERO postings (every fresh name empty of
                # alphanumerics): such parts never enter the index, and the
                # ledger writes must be skipped with the postings — a
                # zero-row batch's meta agg still emits one (0, NULL) row,
                # and NULL min_n_trgm rows poison every later ledger read
                if not trg.isEmpty():
                    # probe-stat ledgers are maintained only for snapshots
                    # that have them (older postings-only snapshots keep
                    # working; the max-df probe just falls back there). BOTH
                    # ledgers are written BEFORE the postings: (a) soundness
                    # — a crash then leaves min_n_trgm ≤ the true min and
                    # df/n_parts inflated, and neither inflated value can
                    # break exactness (the df split only picks WHICH
                    # trigrams probe; the guard uses min_n) — and (b)
                    # mechanics — appending to the postings path invalidates
                    # every cached plan that scans it, including this batch
                    # (its anti-join reads the index), so a ledger write
                    # issued afterwards would recompute against the
                    # post-append index and see an empty batch.
                    has_stats = os.path.exists(
                        table_path(data_dir, TRIGRAM_STATS)
                    ) and os.path.exists(table_path(data_dir, TRIGRAM_META))
                    if has_stats:
                        _write_trigram_meta(spark, trg, data_dir, mode="append")
                        _write_trigram_df_stats(spark, trg, data_dir, mode="append")
                    trg.repartitionByRange(2, "trgm").sortWithinPartitions(
                        "trgm"
                    ).write.mode("append").parquet(path)
            finally:
                trg.unpersist()
        manifest_path = os.path.join(data_dir, "_SNAPSHOT.json")
        with open(manifest_path) as f:
            manifest = json.load(f)
        manifest[TRIGRAM_INDEX]["rows"] = spark.read.parquet(path).count()
        _write_manifest(manifest_path, manifest)
    return {"parts_appended": n_new}


def compact_index(
    spark: SparkSession,
    data_dir: str,
    index_name: str,
    key_col: str,
    n_files: int = 8,
) -> dict:
    """Restore an append-maintained serving index to fully-sorted layout —
    the periodic compaction the append-only builds rely on. Each appended
    batch lands as its own small term-sorted files; probes stay correct
    (footer stats prune per file) but file count and per-term file touches
    grow with every batch. This rewrites the whole index as ``n_files``
    range-partitioned, key-sorted files — one contiguous key range per
    file, the original build's layout — and swaps it in ONLY after the
    re-read digest (rows + order-insensitive content hash, the
    A9/compact_dataset discipline) proves the rewrite lost nothing; a
    failed compaction can never replace a good index. Works for both the
    full-text (key ``tok``) and trigram (key ``trgm``) indexes.

    CONCURRENCY: safe to run alongside the appenders/maintenance streams
    (the documented cron pairing). The rewrite reads an explicit
    point-in-time file listing and runs UNLOCKED; the swap then holds the
    index lock, re-diffs the listing, and carries any file appended during
    the rewrite into the new directory verbatim (appended files are
    self-contained key-sorted parquet — copying them IS an append), so a
    concurrent batch can never be lost. The two renames of the swap are
    NOT atomic as a unit — a crash between them leaves no live directory
    — but `heal_interrupted_compaction` (run here first, and at server
    startup) rolls that window back, and the lock keeps appenders out of
    it."""
    import glob
    import shutil

    path = table_path(data_dir, index_name)
    # COMPACTION flock (distinct from the appender lock), held across the
    # whole rewrite+verify+swap: two compactions of one index share the
    # fixed `.compacting` tmp path, and the rewrite runs outside the index
    # lock — without this, compactor B's mode-overwrite could clobber tmp
    # between A's digest verify and A's swap, and A would rename a
    # partially-written tmp into the live path (corruption the digest check
    # cannot catch). Fail-fast timeout: a second compactor should error
    # immediately, not queue behind an hours-long rewrite.
    with _index_lock(path.rstrip("/") + ".compact", timeout=1.0):
        # patient timeout on the INDEX lock even for this listing phase:
        # appenders legitimately hold it across several Spark jobs
        # (membership anti-joins, parquet writes, two full-index counts for
        # the manifest), which can exceed 60s on a larger corpus — dying
        # here before doing any work would starve the cron'd compaction
        with _index_lock(path, timeout=600.0):
            # clean_tmp is safe ONLY here: concurrent compactions of one
            # index are excluded by the compaction flock above
            heal_interrupted_compaction(path, clean_tmp=True)
            # point-in-time listing: the rewrite covers exactly these files,
            # whatever lands afterwards is handled by the swap-time re-diff
            listed = sorted(glob.glob(os.path.join(path, "*.parquet")))
        src = spark.read.parquet(*listed)
        expected = _table_digest(src)

        tmp = path.rstrip("/") + ".compacting"
        (
            src.repartitionByRange(n_files, key_col)
            .sortWithinPartitions(key_col)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        actual = _table_digest(spark.read.parquet(tmp))
        if actual != expected:
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"index compaction dropped data for {index_name}: "
                f"wrote {expected}, read back {actual}"
            )
        # patient timeout: the rewrite is already done and digest-verified,
        # so waiting out a long-running append (which holds the lock across
        # its Spark jobs) is strictly better than discarding the rewrite
        with _index_lock(path, timeout=600.0):
            # files appended while the rewrite ran: verbatim-copy into the
            # new layout (byte-identical ⇒ lossless by construction; Spark
            # part files carry unique UUID names, so no collision)
            delta = sorted(set(glob.glob(os.path.join(path, "*.parquet"))) - set(listed))
            for f in delta:
                shutil.copy2(f, os.path.join(tmp, os.path.basename(f)))
            old = path.rstrip("/") + ".precompact"
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old)
        out = {
            "files_before": len(listed),
            "files_after": len(glob.glob(os.path.join(path, "*.parquet"))),
            "delta_carried": len(delta),
            "rows": expected[0],
            "ok": True,
        }
        if index_name == TRIGRAM_INDEX:
            # the probe-stat ledgers grow one tiny file per append and are
            # fully derivable from the postings — rebuild them from the
            # compacted index (fold + heal + migration in one move); under
            # the index lock so a concurrent append can't interleave
            with _index_lock(path, timeout=600.0):
                out["ledgers"] = _rebuild_trigram_stats(spark, data_dir)
        if index_name == FULLTEXT_INDEX:
            # the doc ledger grows one file per append too; same
            # digest-verified rewrite+swap, under the index lock (the
            # ledger is docs-scale — orders smaller than the postings
            # rewrite above — so holding the lock through it is cheap
            # relative to the compaction itself). Unlike the probe-stat
            # ledgers this one is a MEMBERSHIP AUTHORITY (token-less docs
            # live only here), hence the full digest/swap/heal discipline
            # rather than a lossy-tolerant overwrite.
            with _index_lock(path, timeout=600.0):
                out["ledger"] = _compact_fulltext_ledger(spark, data_dir, n_files)
                # the probe-stat ledger is fully derivable from the postings,
                # so compaction REBUILDS it from the compacted index — the
                # fold and the heal in one move (crash-inflated df/max_tf
                # from append windows converge back to exact counts here)
                out["stats"] = _rebuild_fulltext_stats(spark, data_dir)
    return out


def _compact_fulltext_ledger(spark: SparkSession, data_dir: str, n_files: int) -> dict:
    """Digest-verified rewrite of the fulltext doc ledger (caller holds the
    index lock and the compaction flock). Crash between the swap's two
    renames strands the ledger in `.precompact`; appenders and make_server
    heal it exactly like the index (they must — a missing ledger would
    otherwise trigger the postings backfill, which cannot represent
    token-less documents)."""
    import glob
    import shutil

    ledger_path = table_path(data_dir, FULLTEXT_DOCS)
    heal_interrupted_compaction(ledger_path, clean_tmp=True)
    if not os.path.isdir(ledger_path):
        return {"ledger": "absent"}
    files_before = len(glob.glob(os.path.join(ledger_path, "*.parquet")))
    src = spark.read.parquet(ledger_path)
    expected = _table_digest(src)
    tmp = ledger_path.rstrip("/") + ".compacting"
    src.repartition(max(1, n_files // 4)).write.mode("overwrite").parquet(tmp)
    actual = _table_digest(spark.read.parquet(tmp))
    if actual != expected:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"ledger compaction dropped data: wrote {expected}, read back {actual}"
        )
    old = ledger_path.rstrip("/") + ".precompact"
    os.rename(ledger_path, old)
    os.rename(tmp, ledger_path)
    shutil.rmtree(old)
    return {
        "files_before": files_before,
        "files_after": len(glob.glob(os.path.join(ledger_path, "*.parquet"))),
        "rows": expected[0],
    }


def _write_fulltext_stats(
    spark: SparkSession, postings: DataFrame, data_dir: str, mode: str
) -> None:
    """(tok, df_inc, max_tf) probe-stat ledger rows for a postings batch
    (see FULLTEXT_STATS). df is the SUM of a token's rows, max_tf the MAX —
    both merge-monotone, so append-only maintenance is exact modulo the
    crash-inflation the probe's bound tolerates."""
    stats = postings.groupBy("tok").agg(
        F.count("*").alias("df_inc"), F.max("tf").alias("max_tf")
    )
    stats.coalesce(1).write.mode(mode).parquet(table_path(data_dir, FULLTEXT_STATS))


def _rebuild_fulltext_stats(spark: SparkSession, data_dir: str) -> dict:
    """Compaction-time wholesale rebuild of the fulltext probe-stat ledger
    from the (just-compacted) postings index — every value in the ledger is
    derivable from the postings, so rebuilding is both the fold AND the
    heal: torn, absent, and crash-inflated states all converge to exact
    counts here. Caller holds the index lock (no concurrent appender can
    write ledger rows that the swap below would drop). Unlike the trigram
    fold this aggregates Spark-side: the token vocabulary is corpus-sized,
    not alphabet-bounded, so a driver collect would not scale. The swap is
    rmtree + rename; a crash between them leaves the ledger ABSENT, which
    the probe treats as decline and the next compaction rebuilds — and
    appenders skip stats maintenance while it is absent, so a readable
    ledger can never silently miss a batch (the soundness invariant:
    ledger max_tf ≥ every indexed tf)."""
    import shutil

    stats_path = table_path(data_dir, FULLTEXT_STATS)
    idx_path = table_path(data_dir, FULLTEXT_INDEX)
    tmp = stats_path.rstrip("/") + ".rebuilding"
    stats = spark.read.parquet(idx_path).groupBy("tok").agg(
        F.count("*").alias("df_inc"), F.max("tf").alias("max_tf")
    )
    stats.coalesce(1).write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    if os.path.exists(stats_path):
        shutil.rmtree(stats_path)
    os.rename(tmp, stats_path)
    return {"rows": n}


def fulltext_rank_maxdf(
    spark: SparkSession,
    data_dir: str,
    terms: list[str],
    topk: int,
    n_docs: int,
    max_df: float = 0.05,
) -> tuple[list[dict] | None, dict]:
    """Max-df skip for the fulltext probe — `/search`'s twin of
    `trigram_rank_maxdf`: candidates come from the RARE query terms only,
    so a stopword-grade term ('the' in a prose corpus) never drives the
    shuffled per-doc aggregate. Hot terms' postings are semi-joined
    (broadcast) against the rare candidate set BEFORE any shuffle, so the
    exchanges carry O(|rare candidates|) rows however common the hot terms
    are; the hot posting run is still scanned once map-side (sorted
    layout, contiguous row groups) — the linear floor any exact answer
    pays.

    EXACTNESS PROOF (returns None — caller falls back — whenever any step
    cannot be established). The fulltext score is pure integer math, so
    the argument is cleaner than the trigram one (no rounding leg):
    - Per-term idf is computed from the POSTINGS (each term's df counted
      from its own matched rows — identical to `fulltext_rank_from_index`
      and the D5 scan plan; the stats ledger only picks the hot/rare
      split, which cannot affect exactness). For every candidate c found
      via ≥1 rare term, score(c) = Σ_rare tf·idf + Σ_hot tf·idf with the
      hot leg counted by the semi-join — the same integer the full plan
      computes, term for term.
    - A doc u missing from the candidate set matches ONLY hot terms, so
      score(u) ≤ Σ_{t hot, df(t)>0} max_tf(t)·idf(t) =: bound, with
      max_tf from the stats ledger (written before every postings append
      and rebuilt exactly at compaction, so ledger max_tf ≥ any indexed
      tf — crash paths only inflate it, growing the bound).
    - Served ONLY if the rare-probe ranking has a full topk rows and the
      k-th score_micro is STRICTLY greater than bound: every unseen doc
      then ranks strictly below all served rows (strict > on the integer
      score means the (score desc, doc_id asc) tie-order cannot be
      violated either). The served topk is row-identical to the full
      plan's.

    Decline cost: the ledger read (footer-pruned to the query terms) plus
    at worst one rare-candidate aggregate before the plain probe answers —
    bounded by ~2× the plain probe, paid only when the corpus's rare terms
    aren't discriminative. The forced broadcast is capped driver-side by
    Σ ledger-df(rare) ≤ MAXDF_BROADCAST_CAP, so a corpus where "rare"
    still means millions of postings takes the plain shuffle plan instead.

    Returns (rows|None, info) — info carries the decision trail for tests
    and the /search route's debugging."""
    info: dict = {"used": False}
    terms = list(dict.fromkeys(terms))  # set semantics, like isin() downstream
    if not terms:
        raise ValueError("query yields no terms")
    stats_path = table_path(data_dir, FULLTEXT_STATS)
    if not os.path.isdir(stats_path):
        info["reason"] = "no stats ledger"
        return None, info
    try:
        stat = {
            r["tok"]: (int(r["df"]), int(r["mtf"]))
            for r in spark.read.parquet(stats_path)
            .filter(F.col("tok").isin(*terms))
            .groupBy("tok")
            .agg(F.sum("df_inc").alias("df"), F.max("max_tf").alias("mtf"))
            .collect()
        }
    except Exception as exc:  # noqa: BLE001 — optional perf structure: a
        # torn state (crash mid-rebuild) must degrade to the plain probe
        info["reason"] = f"unreadable stats ledger: {exc}"
        return None, info
    hot = sorted(t for t in terms if stat.get(t, (0, 0))[0] > max_df * n_docs)
    rare = sorted(t for t in terms if t not in set(hot))
    info.update({"hot": hot, "n_docs": n_docs})
    if not hot:
        info["reason"] = "no hot terms"
        return None, info
    if not rare:
        info["reason"] = "every query term is hot"
        return None, info
    cand_ub = sum(stat.get(t, (0, 0))[0] for t in rare)
    if cand_ub == 0:
        # ledger df only ever over-counts (stats precede every postings
        # append), so ledger-df 0 PROVES no rare posting exists — the
        # candidate set would be empty and the guard would decline anyway;
        # deciding it here costs zero Spark jobs on this common path (a
        # query term that simply isn't in the corpus)
        info["reason"] = "no rare term has any ledger postings"
        return None, info
    if cand_ub > MAXDF_BROADCAST_CAP:
        info["reason"] = f"candidate bound {cand_ub} > broadcast cap {MAXDF_BROADCAST_CAP}"
        return None, info

    idx = spark.read.parquet(table_path(data_dir, FULLTEXT_INDEX))
    # exact per-term df from the postings — the same counts the plain index
    # plan derives; ≤|terms| rows, footer-pruned scan, so collecting is free
    dfreq = {
        r["tok"]: int(r["c"])
        for r in idx.filter(F.col("tok").isin(*terms))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    # exact integer idf, identical to the plans' decimal expression
    # ((10⁶·N) div df): positive-int floor division commutes between
    # Python // and SQL div
    idf = {t: (1_000_000 * int(n_docs)) // dfreq[t] for t in terms if dfreq.get(t)}
    bound = sum(stat[t][1] * idf[t] for t in hot if t in idf)
    info["bound"] = bound
    if not any(t in idf for t in rare):
        info["reason"] = "no rare term matches any posting"
        return None, info
    # per-term idf as a string-valued literal map (exact: ints stringified),
    # cast back to the plans' DECIMAL(38,0) intermediate per row — the
    # contribution tf·idf is then the identical integer, and the split
    # rare+hot sum carries the same decimal-38 overflow envelope (ANSI
    # error, never silent wrap) as the plain plan's single sum
    idf_map = F.create_map(*[F.lit(x) for t, v in sorted(idf.items()) for x in (t, str(v))])
    contrib = F.sum(
        F.col("tf").cast("decimal(38,0)")
        * F.element_at(idf_map, F.col("tok")).cast("decimal(38,0)")
    )
    # the candidate aggregate feeds BOTH the broadcast key set and the
    # final join, so Spark computes the rare subtree twice — DELIBERATELY
    # left unpersisted: the subtree is two map-side scans of ledger-capped
    # posting runs (tiny by construction — the broadcast cap bounds it),
    # while persisting it MEASURED 2× slower end-to-end on the 1M-doc demo
    # corpus (cache materialization defeats column pruning into the
    # broadcast branch, which only needs doc_id, and pins the pre-AQE
    # shuffle layout; spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
    # is false by default)
    cand = (
        idx.filter(F.col("tok").isin(*rare))
        .groupBy("doc_id")
        .agg(contrib.alias("r_score"), F.count("*").alias("r_hits"))
    )
    hot_hits = (
        idx.filter(F.col("tok").isin(*hot))
        .join(F.broadcast(cand.select("doc_id")), "doc_id")
        .groupBy("doc_id")
        .agg(contrib.alias("h_score"), F.count("*").alias("h_hits"))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    rows = [
        r.asDict()
        for r in cand.join(hot_hits, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("r_hits") + F.coalesce(F.col("h_hits"), F.lit(0)))
            .cast("int")
            .alias("n_terms_hit"),
            (F.col("r_score") + F.coalesce(F.col("h_score"), zero))
            .cast("long")
            .alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(topk)
        .collect()
    ]
    if len(rows) < topk or not rows[-1]["score_micro"] > bound:
        info["reason"] = (
            f"guard: {len(rows)} rows, k-th score "
            f"{rows[-1]['score_micro'] if rows else None} !> bound {bound}"
        )
        return None, info
    info["used"] = True
    return rows, info


def trigram_rank_from_index(
    spark: SparkSession, data_dir: str, query: str, topk: int
) -> DataFrame:
    """D6's exact trigram-Jaccard ranking served from the published
    index: probe = term filter pushed into the scan, |∩| = one map-side-
    combined count per candidate id, |∪| from the indexed per-id trigram
    count. Candidates with zero shared trigrams never leave the scan —
    identical results to the corpus-scan plan (sim>0 filters them there
    too), proven in tests."""
    from australian_company_etl_spark.plans.api import _pg_trigrams

    q = _pg_trigrams([w for w in query.lower().split() if w])
    if not q:
        raise ValueError("query yields no trigrams")
    idx = spark.read.parquet(table_path(data_dir, TRIGRAM_INDEX)).filter(
        F.col("trgm").isin(*q)
    )
    inter = F.count("*")
    union = F.col("n_trgm") + F.lit(len(q)) - inter
    scored = idx.groupBy("p_partkey", "p_name", "n_trgm").agg(
        F.round(inter.cast("double") / union, 6).alias("sim")
    )
    return (
        scored.filter(F.col("sim") > 0)
        .orderBy(F.desc("sim"), F.asc("p_partkey"))
        .limit(topk)
        .select("p_partkey", "p_name", "sim")
    )


def _ceil_6dp(num: int, den: int) -> float:
    """num/den rounded UP to 6 decimal places — the sound direction for the
    trigram guard's unseen-sim bound. Python round() is half-EVEN while the
    plans round sims with Spark F.round (half-UP), so a bound landing
    exactly on a half (e.g. 1/128 = 0.0078125) would come out 1e-6 LOW and
    the guard could falsely pass against an unseen part whose rounded sim
    ties the k-th row. Ceiling ≥ half-up of the true value, and also
    absorbs the plans' double-division error (≤1 ulp ≈ 1e-16, while a
    nonzero true-value-to-grid distance is ≥ 1/(10⁶·union) — far larger
    for any real trigram count), so every unseen ROUNDED sim is ≤ this
    bound; the cost is at most one extra decline per exact boundary hit.
    Exact rational via Decimal — no float on the way in."""
    from decimal import ROUND_CEILING, Decimal

    return float(
        (Decimal(num) / Decimal(den)).quantize(
            Decimal("0.000001"), rounding=ROUND_CEILING
        )
    )


def trigram_rank_maxdf(
    spark: SparkSession,
    data_dir: str,
    query: str,
    topk: int,
    max_df: float = 0.05,
) -> tuple[list[dict] | None, dict]:
    """Max-df trigram skip (VERDICT r06 stretch): probe candidates with the
    RARE query trigrams only, so a stopword-analog trigram (' th' in a
    corpus full of 'the') never drives the shuffled candidate aggregate —
    the pg_trgm-style cost lever, made EXACT.

    Cost shape: today's probe shuffles one partial-aggregated row per
    (candidate, partition) for EVERY posting-matched part — a trigram with
    df = 20% of the corpus puts 0.2·N parts through the aggregate. Here
    hot trigrams are excluded from candidate generation; their postings
    are instead semi-joined (broadcast) against the rare-probe candidate
    set BEFORE any shuffle, so the exchanges carry O(|rare-candidates|)
    rows regardless of how common the hot trigrams are. The hot posting
    RUN is still scanned once map-side (sorted layout, contiguous row
    groups) — that linear scan is the floor any exact answer pays.

    EXACTNESS PROOF (returns None — caller falls back — whenever any step
    of it cannot be established):
    - For every candidate c found via ≥1 rare trigram, inter(c) is exact:
      rare matches counted by the probe + hot matches counted by the
      semi-join (posting rows are distinct (trgm, part) pairs by
      construction), so its sim is the same number the full plan computes.
    - The only parts missing from the candidate set share ONLY hot
      trigrams. For such a part u: inter(u) ≤ s (s = |hot ∩ query|), and
      union(u) = n_trgm(u) + |q| − inter(u) ≥ min_n + |q| − s, where
      min_n is the corpus-wide minimum distinct-trigram count (from the
      TRIGRAM_META ledger, maintained crash-conservatively — see its
      comment). Hence sim(u) ≤ s/(min_n + |q| − s) =: bound.
    - The result is served ONLY if the rare-probe ranking has a full topk
      rows and its k-th sim is STRICTLY greater than round(bound, 6).
      Both plans round sims to 6dp and rounding is monotone, so every
      unseen part ranks strictly below all served rows (ties are
      impossible under strict >, so the (sim desc, p_partkey asc)
      tie-order cannot be violated either). The served topk is therefore
      row-identical to the full plan's.

    Decline cost: a declined attempt spends the (tiny, footer-pruned)
    ledger reads plus at worst one rare-candidate aggregate before the
    plain probe answers — bounded by ~2× the plain probe, paid only on
    corpora whose rare trigrams aren't actually discriminative. Measured
    on the sf1 TPC-H part corpus the skip declines for exactly that
    reason (a 92-color vocabulary: the bench query's only non-hot
    trigrams match nothing, and one short replicated name drives
    min_n_trgm to 7, bound 0.8) — the win case is a real-text corpus
    with boilerplate trigrams over a long-tail vocabulary, the shape the
    crafted-corpus test pins down.

    Returns (rows|None, info) — info carries the decision trail for tests
    and the /fuzzy route's debugging."""
    from australian_company_etl_spark.plans.api import _pg_trigrams

    info: dict = {"used": False}
    q = _pg_trigrams([w for w in query.lower().split() if w])
    if not q:
        raise ValueError("query yields no trigrams")
    stats_path = table_path(data_dir, TRIGRAM_STATS)
    meta_path = table_path(data_dir, TRIGRAM_META)
    if not (os.path.isdir(stats_path) and os.path.isdir(meta_path)):
        info["reason"] = "no stats ledgers"
        return None, info
    try:
        meta = spark.read.parquet(meta_path).agg(
            F.sum("n_parts_inc").alias("n_parts"), F.min("min_n_trgm").alias("min_n")
        ).collect()[0]
        if meta["n_parts"] is None or meta["min_n"] is None:
            raise ValueError("empty meta ledger")
        n_parts, min_n = int(meta["n_parts"]), int(meta["min_n"])
        dfs = {
            r["trgm"]: int(r["df"])
            for r in spark.read.parquet(stats_path)
            .filter(F.col("trgm").isin(*q))
            .groupBy("trgm")
            .agg(F.sum("df_inc").alias("df"))
            .collect()
        }
    except Exception as exc:  # noqa: BLE001 — the ledgers are an OPTIONAL
        # perf structure: a torn/empty state (e.g. a crash mid ledger
        # compaction overwrite) must degrade to the plain probe, never 500
        info["reason"] = f"unreadable stats ledgers: {exc}"
        return None, info
    hot = sorted(t for t in q if dfs.get(t, 0) > max_df * n_parts)
    rare = sorted(t for t in q if t not in set(hot))
    info.update({"hot": hot, "n_parts": n_parts, "min_n_trgm": min_n})
    if not hot:
        info["reason"] = "no hot trigrams"
        return None, info
    if not rare:
        info["reason"] = "every query trigram is hot"
        return None, info
    s = len(hot)
    bound = _ceil_6dp(s, min_n + len(q) - s)
    info["bound"] = bound
    # scale bound on the forced broadcast below: the candidate set is at
    # most Σ df(rare) keys (each rare posting contributes one candidate at
    # most), known driver-side from the ledger for free — decline rather
    # than broadcast an unbounded set when the "rare" trigrams are merely
    # less-common (a 100 TB corpus where every query trigram has millions
    # of postings should take the plain shuffle plan, which is built for
    # exactly that).
    cand_ub = sum(dfs.get(t, 0) for t in rare)
    if cand_ub == 0:
        # ledger df only ever over-counts, so 0 proves no rare posting
        # exists — decline without spending a single Spark job
        info["reason"] = "no rare trigram has any ledger postings"
        return None, info
    if cand_ub > MAXDF_BROADCAST_CAP:
        info["reason"] = f"candidate bound {cand_ub} > broadcast cap {MAXDF_BROADCAST_CAP}"
        return None, info

    idx = spark.read.parquet(table_path(data_dir, TRIGRAM_INDEX))
    # computed twice (broadcast keys + final join), deliberately
    # unpersisted — see fulltext_rank_maxdf: the rare subtree is
    # ledger-capped and map-side cheap; persisting it measured 2× slower
    cand = (
        idx.filter(F.col("trgm").isin(*rare))
        .groupBy("p_partkey", "p_name", "n_trgm")
        .agg(F.count("*").alias("r"))
    )
    hot_hits = (
        idx.filter(F.col("trgm").isin(*hot))
        .join(F.broadcast(cand.select("p_partkey")), "p_partkey")
        .groupBy("p_partkey")
        .agg(F.count("*").alias("h"))
    )
    inter = F.col("r") + F.coalesce(F.col("h"), F.lit(0))
    union = F.col("n_trgm") + F.lit(len(q)) - inter
    rows = [
        r.asDict()
        for r in cand.join(hot_hits, "p_partkey", "left")
        .select(
            "p_partkey",
            "p_name",
            F.round(inter.cast("double") / union, 6).alias("sim"),
        )
        .filter(F.col("sim") > 0)
        .orderBy(F.desc("sim"), F.asc("p_partkey"))
        .limit(topk)
        .collect()
    ]
    if len(rows) < topk or not rows[-1]["sim"] > bound:
        info["reason"] = (
            f"guard: {len(rows)} rows, k-th sim "
            f"{rows[-1]['sim'] if rows else None} !> bound {bound}"
        )
        return None, info
    info["used"] = True
    return rows, info


def fulltext_rank_from_index(
    spark: SparkSession, data_dir: str, terms: list[str], topk: int, n_docs: int
) -> DataFrame:
    """D5's exact ranking served from the published index: term filter
    pushed into the index scan (row-group pruning on the tok sort), each
    term's df counted from its own matched postings (exact — the filter
    keeps every posting of a matched term; this is what lets the stored
    layout stay append-only), one map-side-combined per-doc aggregate,
    sort-limit top-k. ``n_docs`` comes from the snapshot manifest.
    Proven row-identical to the scan-based plan in tests."""
    idx = spark.read.parquet(table_path(data_dir, FULLTEXT_INDEX)).filter(
        F.col("tok").isin(*terms)
    )
    return _rank_matched_postings(idx, topk, n_docs)


def _rank_matched_postings(idx: DataFrame, topk: int, n_docs: int) -> DataFrame:
    """The shared exact scorer over term-matched (tok, doc_id, tf) rows —
    df counted from each term's own matched postings, DECIMAL(38,0) tf·idf
    sum per doc, sort-limit top-k. Identical expressions whichever layout
    (flat rows or exploded shard segments) produced ``idx``."""
    dfreq = idx.groupBy("tok").agg(F.count("*").alias("df_docs"))
    scored = (
        idx.join(F.broadcast(dfreq), "tok")
        # BIGINT, not a plain int literal: 1000000 * n_docs overflows int32
        # past ~2147 docs (the scan plan's count(*) is already bigint)
        .withColumn("n_docs", F.lit(int(n_docs)).cast("bigint"))
        .groupBy("doc_id")
        .agg(
            # DECIMAL(38,0) intermediates — byte-identical formula to the
            # D5 scan plan (plans/api.py), which documents the overflow
            # envelope; the two paths must stay row-identical.
            F.sum(
                F.expr(
                    "CAST(tf AS DECIMAL(38,0))"
                    " * ((CAST(1000000 AS DECIMAL(38,0)) * n_docs) div df_docs)"
                )
            )
            .cast("long")
            .alias("score_micro"),
            F.count("*").cast("int").alias("n_terms_hit"),
        )
    )
    return (
        scored.orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(topk)
        .select("doc_id", "n_terms_hit", "score_micro")
    )


def fulltext_rank_from_sharded(
    spark: SparkSession, data_dir: str, terms: list[str], topk: int, n_docs: int
) -> DataFrame:
    """D5's exact ranking served from the SHARDED posting segments
    (`/search?shard=1`): term filter pushed into the tok-sorted segment
    scan, matched segments exploded back to (tok, doc_id, tf) postings,
    then the identical shared scorer. EXACTNESS: segments partition each
    token's postings (additive across duplicate (tok, shard) rows from
    appends — exploding unions them), so the exploded frame is row-for-row
    the flat index's matched postings and every downstream expression is
    shared code. Proven row-identical to `fulltext_rank_from_index` in
    tests, including on a hot-token corpus where one term spans many
    segments."""
    seg = spark.read.parquet(table_path(data_dir, FULLTEXT_SHARDED)).filter(
        F.col("tok").isin(*terms)
    )
    idx = seg.select(
        "tok", F.explode(F.arrays_zip("doc_ids", "tfs")).alias("p")
    ).select(
        "tok", F.col("p.doc_ids").alias("doc_id"), F.col("p.tfs").alias("tf")
    )
    return _rank_matched_postings(idx, topk, n_docs)


def _table_digest(df: DataFrame) -> tuple[int, int]:
    """(rows, order-insensitive content hash) in one aggregate pass — the
    publish-integrity check (same discipline as sources/export.py:54-75)."""
    row_hash = F.crc32(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(df.columns)])
    )
    r = df.agg(F.count("*").alias("rows"), F.sum(row_hash).alias("h")).collect()[0]
    return int(r["rows"]), int(r["h"] or 0)


def snapshot_tables(
    spark: SparkSession, sf_dir: str, out_dir: str, tables: list[str] | None = None
) -> dict:
    """Spark-publish the serving snapshot and verify it by re-read.

    Writes each backing table to ``{out_dir}/{table}.parquet`` (a parquet
    directory — `table_path` addressing, so the D plans point at the
    snapshot with ``sf_dir=out_dir`` unchanged) and fails loudly if any
    re-read digest disagrees with the source — a torn publish never
    serves. Returns ``{table: {"rows": n, "content_hash": h}}``."""
    os.makedirs(out_dir, exist_ok=True)
    src = load_tables(spark, sf_dir, tables or SERVING_TABLES)
    manifest = {}
    for name, df in src.items():
        expected = _table_digest(df)
        df.write.mode("overwrite").parquet(table_path(out_dir, name))
        actual = _table_digest(spark.read.parquet(table_path(out_dir, name)))
        if actual != expected:
            raise RuntimeError(
                f"snapshot verify failed for {name}: wrote {expected}, read back {actual}"
            )
        manifest[name] = {"rows": expected[0], "content_hash": expected[1]}
    if "documents" in manifest:
        manifest[FULLTEXT_INDEX] = build_fulltext_index(spark, sf_dir, out_dir)
        manifest[FULLTEXT_SHARDED] = build_fulltext_index_sharded(spark, sf_dir, out_dir)
    if "part" in manifest:
        manifest[TRIGRAM_INDEX] = {"rows": build_trigram_index(spark, sf_dir, out_dir)}
    _write_manifest(os.path.join(out_dir, "_SNAPSHOT.json"), manifest)
    return manifest


def _rows_payload(df: DataFrame) -> dict:
    rows = [r.asDict() for r in df.collect()]
    return {"n": len(rows), "rows": rows}


def _int_param(q: dict[str, str], name: str, default: int, lo: int | None = 1) -> int:
    """Parse an integer query param; non-integers AND out-of-range values
    (e.g. limit=-1, k=0) raise ValueError → a 400 bad request, never a
    500 from DataFrame.limit(-1)."""
    raw = q.get(name)
    if raw is None:
        return default
    v = int(raw)
    if lo is not None and v < lo:
        raise ValueError(f"{name} must be >= {lo}, got {v}")
    return v


def _maxdf_param(q: dict[str, str]) -> float:
    """Parse the optional ``?maxdf=`` skip control: absent → the 0.05
    default; 0 (any numeric spelling) → skip disabled, plain probe;
    (0, 1] → the hot-term df threshold; anything else → ValueError → 400,
    like every other parameter. (Previously only the literal string '0'
    was honored and e.g. ?maxdf=0.02 was silently ignored.)"""
    raw = q.get("maxdf")
    if raw is None:
        return 0.05
    v = float(raw)
    if not 0 <= v <= 1:
        raise ValueError(f"maxdf must be in [0, 1], got {v}")
    return v


def _paged_payload(df: DataFrame, key_col: str, q: dict[str, str]) -> dict:
    """Serve a filter route as a bounded keyset page (the D4 discipline):
    order by the key, cap at MAX_PAGE_SIZE, and return a ``next_after``
    cursor when more rows remain (probed with one extra row, so a result
    that fits under the cap is exactly the reference's full answer with
    ``next_after: null``). The reference's unbounded fetchall
    (main.py:44-49) does not survive a hot filter over a 100 TB table —
    this cap is a deliberate deviation, reference-identical under the cap."""
    limit = min(_int_param(q, "limit", MAX_PAGE_SIZE), MAX_PAGE_SIZE)
    after = _int_param(q, "after", None, lo=None)
    if after is not None:
        df = df.filter(F.col(key_col) > after)
    rows = [r.asDict() for r in df.orderBy(key_col).limit(limit + 1).collect()]
    more = len(rows) > limit
    rows = rows[:limit]
    return {
        "n": len(rows),
        "rows": rows,
        "next_after": rows[-1][key_col] if more and rows else None,
    }


_COMPANY_PATH = re.compile(r"^/companies/(\d+)$")


class _Handler(BaseHTTPRequestHandler):
    """Routes = the D-family plans against the snapshot directory.

    | route | plan | reference |
    | /companies/{key} | D1 api_lookup_by_key | main.py:15-38 |
    | /companies/search?q=[&after=&limit=] | D2 api_search_ilike, keyset-paged | main.py:40-49 |
    | /companies/by_state?state=[&after=&limit=] | D3 api_by_state, keyset-paged | main.py:51-59 |
    | /companies?after=&limit= | D4 api_page_keyset | (keyset pagination) |
    | /search?q=w+w&k=[&shard=1] | D5 api_fulltext_rank | (ranked full-text; shard=1 serves from posting segments) |
    | /fuzzy?q=&k= | D6 api_search_trigram | (pg_trgm similarity) |

    Every result set is capped at MAX_PAGE_SIZE; the filter routes page by
    keyset cursor (``next_after``) like /companies — the reference's
    unbounded fetchall responses are served identically when they fit
    under the cap.
    """

    # set by make_server
    spark: SparkSession = None
    data_dir: str = None

    def log_message(self, fmt, *args):  # quiet by default; tests assert bodies
        pass

    def _live_index(self, name: str) -> bool:
        """True if the index directory is live — healing a compaction that
        died mid-swap (live dir missing, data stranded in ``.precompact``)
        first. make_server runs this heal at startup, but a compactor can
        die mid-swap while the server is RUNNING, and without appenders
        (a read-mostly box) nothing else would ever roll the window back:
        probes would silently degrade to the corpus scan (or 500 on an
        index-only snapshot) until the next maintenance run. Request-time
        heal closes that. A LIVE compaction mid-swap holds the index lock,
        so the short lock timeout distinguishes it from a dead one — on
        timeout we just re-check and at worst this one request takes the
        scan fallback while the swap completes. (The probe itself still
        reads lock-free; the irreducible race of a swap landing between
        this check and the scan is one transient failed request, not the
        persistent outage this heals.)"""
        p = table_path(self.data_dir, name)
        if not os.path.isdir(p) and os.path.isdir(p.rstrip("/") + ".precompact"):
            with contextlib.suppress(OSError, TimeoutError):
                with _index_lock(p, timeout=5.0):
                    heal_interrupted_compaction(p)
        return os.path.isdir(p)

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 — http.server contract
        try:
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            self._route(url.path, q)
        except (ValueError, KeyError) as exc:
            self._send(400, {"error": f"bad request: {exc}"})
        except Exception as exc:  # noqa: BLE001 — a route bug must not kill the server
            self._send(500, {"error": f"internal: {exc}"})

    def _route(self, path: str, q: dict[str, str]) -> None:
        spark, d = self.spark, self.data_dir
        m = _COMPANY_PATH.match(path)
        if m:
            out = _rows_payload(api_plans.api_lookup_by_key(spark, d, key=int(m.group(1))))
            if out["n"] == 0:
                # reference parity on the BODY (main.py:37); the 404 status
                # is a deliberate deviation — the reference FastAPI service
                # returns the error body with HTTP 200 (it never sets a
                # status code), which proper clients can't branch on.
                self._send(404, {"error": "Company not found"})
            else:
                self._send(200, out)
        elif path == "/companies/search":
            # bounded keyset page over the D2 plan (cap + cursor; the
            # reference's unbounded fetchall is the under-cap special case)
            self._send(
                200,
                _paged_payload(api_plans.api_search_ilike(spark, d, pattern=q["q"]), "p_partkey", q),
            )
        elif path == "/companies/by_state":
            self._send(
                200,
                _paged_payload(api_plans.api_by_state(spark, d, state=q["state"]), "c_custkey", q),
            )
        elif path == "/companies":
            limit = min(_int_param(q, "limit", api_plans.PAGE_SIZE), MAX_PAGE_SIZE)
            after = _int_param(q, "after", 0, lo=None)
            out = _rows_payload(api_plans.api_page_keyset(spark, d, after=after, limit=limit))
            # next-page cursor = last key served (keyset pagination contract)
            out["next_after"] = out["rows"][-1]["c_custkey"] if out["rows"] else None
            self._send(200, out)
        elif path == "/search":
            terms = [w for w in q["q"].lower().split() if w]
            if not terms:
                raise ValueError("q must contain at least one term")
            k = min(_int_param(q, "k", api_plans.FT_TOPK), MAX_PAGE_SIZE)
            # parsed up front: a malformed ?maxdf= is a 400 whatever the
            # snapshot layout (0 forces the plain probe, (0,1] sets the
            # hot-term threshold)
            max_df = _maxdf_param(q)
            # ?shard=1 answers from the sharded posting segments (r12 —
            # proven row-identical to the flat probe); absent sharded
            # snapshot is a client error, not a silent fallback
            if q.get("shard") == "1":
                if not self._live_index(FULLTEXT_SHARDED):
                    raise ValueError("snapshot has no sharded fulltext index")
                with open(os.path.join(d, "_SNAPSHOT.json")) as f:
                    n_docs = json.load(f)[FULLTEXT_INDEX]["n_docs"]
                self._send(
                    200, _rows_payload(fulltext_rank_from_sharded(spark, d, terms, k, n_docs))
                )
                return
            # serve from the published index (term-pruned probe) when the
            # snapshot has one; ?scan=1 forces the corpus-scan plan (the
            # two are proven row-identical in tests)
            if "scan" not in q and self._live_index(FULLTEXT_INDEX):
                with open(os.path.join(d, "_SNAPSHOT.json")) as f:
                    n_docs = json.load(f)[FULLTEXT_INDEX]["n_docs"]
                # max-df skip first (exact by its guard, or declines)
                rows = None
                if max_df > 0:
                    rows, _info = fulltext_rank_maxdf(
                        spark, d, terms, k, n_docs, max_df=max_df
                    )
                if rows is not None:
                    out = {"n": len(rows), "rows": rows}
                else:
                    out = _rows_payload(fulltext_rank_from_index(spark, d, terms, k, n_docs))
            else:
                out = _rows_payload(api_plans.api_fulltext_rank(spark, d, terms=terms, topk=k))
            self._send(200, out)
        elif path == "/fuzzy":
            k = min(_int_param(q, "k", api_plans.TRGM_TOPK), MAX_PAGE_SIZE)
            if not [w for w in q["q"].lower().split() if w]:
                raise ValueError("q must contain at least one word")
            max_df = _maxdf_param(q)  # up front: malformed values 400
            if "scan" not in q and self._live_index(TRIGRAM_INDEX):
                # max-df skip first (exact by its guard, or declines)
                rows = None
                if max_df > 0:
                    rows, _info = trigram_rank_maxdf(spark, d, q["q"], k, max_df=max_df)
                if rows is not None:
                    out = {"n": len(rows), "rows": rows}
                else:
                    out = _rows_payload(trigram_rank_from_index(spark, d, q["q"], k))
            else:
                out = _rows_payload(api_plans.api_search_trigram(spark, d, query=q["q"], topk=k))
            self._send(200, out)
        elif path == "/health":
            with open(os.path.join(d, "_SNAPSHOT.json")) as f:
                self._send(200, {"ok": True, "snapshot": json.load(f)})
        else:
            self._send(404, {"error": f"no route {path}"})


def make_server(spark: SparkSession, data_dir: str, port: int = 0) -> ThreadingHTTPServer:
    """Build the HTTP server over a published snapshot directory. ``port=0``
    binds an ephemeral port (tests); `server.server_address[1]` has it.
    Startup first heals any compaction that died mid-swap (a missing live
    index directory with the data stranded in ``.precompact``) so probes
    never 500 against a half-swapped index."""
    # each healed path is guarded by the lock its SWAPPER holds: the doc
    # ledger is swapped by _compact_fulltext_ledger under the fulltext
    # INDEX lock, so healing it under a fulltext_docs lock of its own
    # would let this startup heal roll back a LIVE ledger compaction
    # between its two renames (the live compactor holds only the index
    # lock, which a ledger-path lock would not contend with)
    for idx, lock_owner in (
        (FULLTEXT_INDEX, FULLTEXT_INDEX),
        (FULLTEXT_DOCS, FULLTEXT_INDEX),
        (TRIGRAM_INDEX, TRIGRAM_INDEX),
    ):
        p = table_path(data_dir, idx)
        if os.path.exists(p) or os.path.exists(p.rstrip("/") + ".precompact"):
            try:
                # under the lock: a live compaction mid-swap must not see
                # its .precompact rolled back between its two renames
                with _index_lock(table_path(data_dir, lock_owner)):
                    heal_interrupted_compaction(p)
            except OSError as exc:
                # read-only snapshot mount: the lock file cannot be created
                # (EROFS/EACCES). Healing is only meaningful where
                # appenders/compaction run — which requires a writable dir
                # anyway — so degrade to a warning instead of refusing to
                # serve a published read-only snapshot.
                import errno
                import warnings

                if exc.errno not in (errno.EROFS, errno.EACCES, errno.EPERM):
                    raise
                warnings.warn(
                    f"snapshot dir not writable ({exc}); skipping startup "
                    f"compaction heal for {idx}",
                    RuntimeWarning,
                    stacklevel=2,
                )
    handler = type("Handler", (_Handler,), {"spark": spark, "data_dir": data_dir})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def serve_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
