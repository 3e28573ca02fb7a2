"""Sink exports (dump_db.py parity): single-file CSV + partitioned parquet."""

from __future__ import annotations

import glob

from australian_company_etl_spark.sources.export import export_csv, export_parquet
from australian_company_etl_spark.sources.registry import load_tables


def test_export_csv_single_file(spark, sf_dir, tmp_path):
    nation = load_tables(spark, sf_dir, ["nation"])["nation"]
    path = str(tmp_path / "nation_dump")
    export_csv(nation, path, single_file=True)
    parts = glob.glob(f"{path}/part-*.csv")
    assert len(parts) == 1  # the reference's one-CSV contract
    back = spark.read.option("header", True).csv(path)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_export_parquet_partitioned(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    path = str(tmp_path / "orders_dump")
    export_parquet(orders, path, partition_by=["o_orderstatus"])
    dirs = glob.glob(f"{path}/o_orderstatus=*")
    assert len(dirs) >= 2
    back = spark.read.parquet(path)
    assert back.count() == orders.count()


def test_manifest_publish_and_verify(spark, sf_dir, tmp_path):
    from australian_company_etl_spark.sources.export import (
        export_with_manifest,
        verify_manifest,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    path = str(tmp_path / "docs_release")
    manifest = export_with_manifest(docs, path, ["source"])
    assert len(manifest["partitions"]) == docs.select("source").distinct().count()
    assert all(p["rows"] > 0 for p in manifest["partitions"].values())
    assert verify_manifest(spark, path)["ok"]


def test_manifest_detects_lost_partition(spark, sf_dir, tmp_path):
    import glob
    import os

    from australian_company_etl_spark.sources.export import (
        export_with_manifest,
        verify_manifest,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    path = str(tmp_path / "docs_release")
    export_with_manifest(docs, path, ["source"])
    # simulate a lost shard: drop one partition's data files
    victim = sorted(glob.glob(f"{path}/source=*"))[0]
    for f in glob.glob(f"{victim}/*.parquet"):
        os.remove(f)
    res = verify_manifest(spark, path)
    assert not res["ok"]
    assert len(res["mismatches"]) == 1


def test_compaction_merges_small_files_and_preserves_content(spark, sf_dir, tmp_path):
    import glob

    from australian_company_etl_spark.sources.export import (
        compact_dataset,
        export_with_manifest,
        verify_manifest,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    path = str(tmp_path / "docs_release")
    # fragment: 12 writer tasks per partition → many tiny files
    export_with_manifest(docs.repartition(12), path, ["source"])
    n_parts = len(glob.glob(f"{path}/source=*"))
    frag = glob.glob(f"{path}/source=*/*.parquet")
    assert len(frag) > 2 * n_parts

    res = compact_dataset(spark, path, target_bytes=128 << 20)
    assert res["ok"]
    assert res["files_before"] == len(frag)
    # every partition fits one target file → exactly one file per partition
    assert res["files_after"] == n_parts
    # content survived byte-for-byte (manifest hash) and the original
    # manifest still verifies against the rewritten layout
    assert verify_manifest(spark, path)["ok"]
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)


def test_compaction_splits_large_partitions_evenly(spark, sf_dir, tmp_path):
    import glob
    import os

    from australian_company_etl_spark.sources.export import (
        compact_dataset,
        export_with_manifest,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    path = str(tmp_path / "docs_release")
    export_with_manifest(docs.repartition(12), path, ["source"])
    # tiny target → each partition must split into several balanced files
    res = compact_dataset(spark, path, target_bytes=2 << 10)
    n_parts = len(glob.glob(f"{path}/source=*"))
    assert res["files_after"] > n_parts
    # balance: within each partition no file dwarfs the rest — salt routing
    # is crc32-uniform; a hash collision can merge salt groups (≈2× avg),
    # never concentrate the whole partition in one file
    for pdir in glob.glob(f"{path}/source=*"):
        sizes = sorted(os.path.getsize(f) for f in glob.glob(f"{pdir}/*.parquet"))
        if len(sizes) > 1:
            assert sizes[-1] < 4 * (sum(sizes) / len(sizes))


# ── JDBC sink option plumbing (no server in sandbox — the contract is the
# option map and writer wiring, pinned here; end-to-end needs a database) ──


def test_jdbc_options_defaults_and_overrides():
    from australian_company_etl_spark.sources.export import jdbc_options

    opts = jdbc_options("jdbc:postgresql://db:5432/ref", "staging_abr")
    assert opts["dbtable"] == "staging_abr"
    assert opts["batchsize"] == "10000"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["truncate"] == "false"
    assert "numPartitions" not in opts

    opts = jdbc_options(
        "jdbc:postgresql://db/ref",
        "t",
        batchsize=500,
        isolation_level="NONE",
        num_partitions=16,
        truncate=True,
        driver="org.postgresql.Driver",
        properties={"reWriteBatchedInserts": "true"},
    )
    assert opts["batchsize"] == "500"
    assert opts["isolationLevel"] == "NONE"
    assert opts["numPartitions"] == "16"
    assert opts["truncate"] == "true"
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["reWriteBatchedInserts"] == "true"


def test_jdbc_options_rejects_bad_values():
    import pytest

    from australian_company_etl_spark.sources.export import jdbc_options

    with pytest.raises(ValueError):
        jdbc_options("u", "t", batchsize=0)
    with pytest.raises(ValueError):
        jdbc_options("u", "t", isolation_level="DIRTY")
    with pytest.raises(ValueError):
        jdbc_options("u", "t", num_partitions=0)


def test_to_jdbc_wires_writer(monkeypatch):
    from australian_company_etl_spark.sources import export

    class FakeWriter:
        def __init__(self):
            self.calls = {"options": {}}

        def format(self, f):
            self.calls["format"] = f
            return self

        def mode(self, m):
            self.calls["mode"] = m
            return self

        def option(self, k, v):
            self.calls["options"][k] = v
            return self

        def save(self):
            self.calls["saved"] = True

    class FakeDF:
        def __init__(self):
            self.write = FakeWriter()

    df = FakeDF()
    export.to_jdbc(df, "jdbc:postgresql://db/ref", "unified", mode="overwrite", truncate=True)
    c = df.write.calls
    assert c["format"] == "jdbc" and c["mode"] == "overwrite" and c["saved"]
    assert c["options"]["dbtable"] == "unified"
    assert c["options"]["truncate"] == "true"

    import pytest

    with pytest.raises(ValueError):
        export.to_jdbc(FakeDF(), "u", "t", mode="upsert")


def test_webdataset_shards_roundtrip_and_determinism(spark, sf_dir, tmp_path):
    """Tar-shard sink: every document comes back byte-identical through
    the loader-side iterator, shard assignment is the deterministic hash
    (no RNG), and two writes of the same frame produce byte-identical
    shards (mtime pinned, members key-sorted)."""
    import hashlib
    import os
    import zlib

    from pyspark.sql import functions as F

    from australian_company_etl_spark.sources import export
    from australian_company_etl_spark.sources.registry import load_tables

    docs = (
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .select("doc_id", "text", F.col("source").alias("meta"))
        .limit(200)
    )
    out1 = str(tmp_path / "wds1")
    m = export.export_webdataset(docs, out1, "doc_id", {"txt": "text", "json": "meta"}, n_shards=4)
    assert m["samples"] == docs.count()
    assert sum(m["per_shard"].values()) == m["samples"]

    want = {str(r.doc_id): (r.text, r.meta) for r in docs.collect()}
    seen = {}
    for key, grp in export.iter_webdataset(out1):
        assert grp["_shard_file"] == f"shard-{zlib.crc32(key.encode()) % 4:05d}.tar"
        seen[key] = (grp["txt"].decode(), grp["json"].decode())
    assert seen == want

    out2 = str(tmp_path / "wds2")
    export.export_webdataset(docs, out2, "doc_id", {"txt": "text", "json": "meta"}, n_shards=4)

    def digest(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if f.endswith(".tar")
        }

    assert digest(out1) == digest(out2), "shard bytes must be reproducible"


def test_webdataset_binary_members_and_stale_shard_cleanup(spark, sf_dir, tmp_path):
    """Binary columns round-trip raw (the multimodal delivery case), and
    re-exporting with fewer shards removes orphan shard files."""
    import glob
    import os

    from pyspark.sql import functions as F

    from australian_company_etl_spark.sources import export
    from australian_company_etl_spark.sources.registry import load_tables

    docs = (
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .select("doc_id", "text", F.encode(F.col("text"), "utf-8").alias("payload"))
        .limit(50)
    )
    out = str(tmp_path / "wds")
    export.export_webdataset(docs, out, "doc_id", {"bin": "payload"}, n_shards=8)
    assert len(glob.glob(os.path.join(out, "shard-*.tar"))) == 8
    want = {str(r.doc_id): bytes(r.payload) for r in docs.collect()}
    got = {k: grp["bin"] for k, grp in export.iter_webdataset(out)}
    assert got == want  # raw bytes, not stringified

    export.export_webdataset(docs, out, "doc_id", {"bin": "payload"}, n_shards=2)
    assert len(glob.glob(os.path.join(out, "shard-*.tar"))) == 2
    assert {k: g["bin"] for k, g in export.iter_webdataset(out)} == want


def test_webdataset_struct_members_are_json_and_dup_keys_rejected(spark, sf_dir, tmp_path):
    """A struct column mapped to a .json member must come back as REAL
    JSON (json.loads-able, not Python Row repr), and duplicate key_col
    values must fail loudly instead of writing same-named tar members
    that loaders silently merge."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from australian_company_etl_spark.sources import export
    from australian_company_etl_spark.sources.registry import load_tables

    docs = (
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .select(
            "doc_id",
            "text",
            F.struct(
                F.col("source"), F.length("text").alias("n_chars")
            ).alias("meta"),
        )
        .limit(50)
    )
    out = str(tmp_path / "wds_json")
    export.export_webdataset(docs, out, "doc_id", {"txt": "text", "json": "meta"}, n_shards=2)
    want = {str(r.doc_id): r.meta.asDict() for r in docs.collect()}
    n = 0
    for key, grp in export.iter_webdataset(out):
        parsed = json.loads(grp["json"])  # Python repr would throw here
        assert parsed == want[key]
        n += 1
    assert n == 50

    dup = docs.select(F.lit(7).alias("doc_id"), "text", "meta")
    with pytest.raises(ValueError, match="not unique"):
        export.export_webdataset(
            dup, str(tmp_path / "wds_dup"), "doc_id", {"txt": "text"}, n_shards=2
        )


def test_compact_dataset_heals_midswap_crash(spark, sf_dir, tmp_path):
    """A compaction that dies between the swap's two renames leaves no
    dataset at `path` (data stranded in .precompact): every reader and a
    rerun of compact_dataset failed with FileNotFoundError forever (review
    finding). The rerun must heal the window and compact normally."""
    import os

    from australian_company_etl_spark.sources.export import (
        compact_dataset,
        export_with_manifest,
        verify_manifest,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    path = str(tmp_path / "docs_release")
    export_with_manifest(docs.repartition(6), path, ["source"])
    # the exact crash state: first rename done, second never ran
    os.rename(path, path + ".precompact")
    res = compact_dataset(spark, path, target_bytes=128 << 20)
    assert res["ok"]
    assert not os.path.exists(path + ".precompact")
    assert verify_manifest(spark, path)["ok"]
    assert spark.read.parquet(path).count() == docs.count()


def test_manifest_keys_survive_separator_values(spark, tmp_path):
    """Partition values containing the old '|' separator (review finding):
    ('x','y|z') and ('x|y','z') collided to one manifest key, silently
    overwriting one partition's stats, and compaction's key.split broke on
    any value with a '|'. JSON-array keys must keep them distinct through
    publish, verify, AND compaction."""
    from australian_company_etl_spark.sources.export import (
        compact_dataset,
        export_with_manifest,
        verify_manifest,
    )

    df = spark.createDataFrame(
        [(1, "x", "y|z"), (2, "x|y", "z"), (3, "x", "y|z"), (4, "AU|NZ", "w")],
        "id bigint, country string, region string",
    )
    path = str(tmp_path / "piped")
    manifest = export_with_manifest(df, path, ["country", "region"])
    assert len(manifest["partitions"]) == 3  # no key collision
    assert verify_manifest(spark, path)["ok"]
    res = compact_dataset(spark, path, target_bytes=128 << 20)
    assert res["ok"]
    back = spark.read.parquet(path)
    assert back.count() == 4
    assert {(r.country, r.region) for r in back.collect()} == {
        ("x", "y|z"), ("x|y", "z"), ("AU|NZ", "w"),
    }


def test_legacy_pipe_joined_manifest_still_verifies_and_compacts(spark, tmp_path):
    """ADVICE r7 (low): the JSON-array key change must not strand datasets
    published under the old '|'-joined key scheme — json.loads raised on
    them, making every existing manifest unverifiable and uncompactable.
    A manifest rewritten to legacy keys must still verify ok and compact."""
    import json
    import os

    from australian_company_etl_spark.sources.export import (
        MANIFEST_NAME,
        compact_dataset,
        export_with_manifest,
        verify_manifest,
    )

    df = spark.createDataFrame(
        [(1, "AU", "nsw"), (2, "AU", "vic"), (3, "NZ", "akl"), (4, "AU", "nsw")],
        "id bigint, country string, state string",
    )
    path = str(tmp_path / "legacy")
    export_with_manifest(df, path, ["country", "state"])
    mpath = os.path.join(path, MANIFEST_NAME)
    with open(mpath) as f:
        manifest = json.load(f)
    # rewrite keys to the pre-change '|'-joined form
    manifest["partitions"] = {
        "|".join(json.loads(k)): v for k, v in manifest["partitions"].items()
    }
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    assert verify_manifest(spark, path)["ok"]
    res = compact_dataset(spark, path, target_bytes=128 << 20)
    assert res["ok"]
    back = spark.read.parquet(path)
    assert back.count() == 4
    assert {(r.country, r.state) for r in back.collect()} == {
        ("AU", "nsw"), ("AU", "vic"), ("NZ", "akl"),
    }


def _wds_docs(spark, sf_dir, n=60):
    from pyspark.sql import functions as F

    return (
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .select("doc_id", "text", F.col("source").alias("meta"))
        .limit(n)
    )


def _wds_digest(d):
    import hashlib
    import os

    return {
        f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(d))
        if f.endswith(".tar")
    }


def test_webdataset_loader_refuses_unverifiable_dirs(spark, sf_dir, tmp_path):
    """iter_webdataset is manifest-gated (VERDICT r09): a dir without
    `_WDS_MANIFEST.json` (crashed/in-progress write), with a stale extra
    shard, with a shard missing, or with a substituted shard whose sample
    count disagrees must all be LOUD errors — never silently-yielded torn
    or stale samples."""
    import os
    import shutil

    import pytest

    from australian_company_etl_spark.sources import export

    docs = _wds_docs(spark, sf_dir)
    out = str(tmp_path / "wds")
    export.export_webdataset(docs, out, "doc_id", {"txt": "text", "json": "meta"}, n_shards=4)
    want = {k: g["txt"] for k, g in export.iter_webdataset(out)}
    assert len(want) == 60

    # (a) manifest absent — the every-crash-state signature of the writer
    mpath = os.path.join(out, "_WDS_MANIFEST.json")
    os.rename(mpath, mpath + ".hidden")
    with pytest.raises(FileNotFoundError, match="refusing"):
        next(export.iter_webdataset(out))
    os.rename(mpath + ".hidden", mpath)

    # (b) stale extra shard (the half-cleaned-dir scenario)
    extra = os.path.join(out, "shard-00099.tar")
    shutil.copy(os.path.join(out, "shard-00000.tar"), extra)
    with pytest.raises(ValueError, match="unexpected"):
        list(export.iter_webdataset(out))
    os.remove(extra)

    # (c) shard missing (partial transfer)
    hidden = os.path.join(out, "shard-00001.tar")
    os.rename(hidden, hidden + ".hidden")
    with pytest.raises(ValueError, match="missing"):
        list(export.iter_webdataset(out))
    os.rename(hidden + ".hidden", hidden)

    # (d) substituted shard: a VALID tar whose sample count disagrees with
    # the manifest (torn-but-parseable class) — caught at shard end
    shutil.copy(os.path.join(out, "shard-00000.tar"), hidden)
    with pytest.raises(ValueError, match="torn or substituted"):
        list(export.iter_webdataset(out))

    # (e) heal: a re-export restores the full verified dataset
    export.export_webdataset(docs, out, "doc_id", {"txt": "text", "json": "meta"}, n_shards=4)
    assert {k: g["txt"] for k, g in export.iter_webdataset(out)} == want


def test_webdataset_crash_at_every_mutation_boundary(spark, sf_dir, tmp_path, monkeypatch):
    """Enumerative crash fuzz of export_webdataset's driver-side protocol
    (the compact_dataset family, VERDICT r09 task 6): crash immediately
    before the k-th filesystem mutation under the export dir (manifest
    invalidation, stale-shard removes, the atomic publish's json.dump and
    os.replace) for k = 1, 2, … until a run completes. At EVERY crash
    point the loader must refuse loudly (no manifest, or a shard set that
    disagrees with the stale manifest) — never yield a wrong sample set —
    and a plain re-export must converge to the from-scratch bytes.

    The executor-side tar writes run in Python worker processes that
    driver monkeypatching cannot reach; their crash signature (torn tar,
    manifest already invalidated) is exactly state (a) of the tamper test
    above, plus the torn-tar-with-fresh-manifest class being impossible
    by construction (manifest removed before any shard byte changes,
    republished only after every writer returned)."""
    import json
    import os

    import pytest

    from australian_company_etl_spark.sources import export

    docs = _wds_docs(spark, sf_dir)
    out = str(tmp_path / "wds_crash")
    root = os.path.abspath(out)

    # from-scratch reference (no injection)
    ref = str(tmp_path / "wds_ref")
    export.export_webdataset(docs, ref, "doc_id", {"txt": "text"}, n_shards=4)
    want_bytes = _wds_digest(ref)
    want_samples = {k: g["txt"] for k, g in export.iter_webdataset(ref)}

    class SimulatedCrash(BaseException):
        pass

    state = {"crash_at": None, "count": 0, "armed": False}

    def hit(*paths):
        if not state["armed"]:
            return
        if not any(
            isinstance(p, str) and os.path.abspath(p).startswith(root) for p in paths
        ):
            return
        state["count"] += 1
        if state["crash_at"] is not None and state["count"] >= state["crash_at"]:
            raise SimulatedCrash(f"mutation {state['count']}")

    real_remove, real_replace, real_dump = os.remove, os.replace, json.dump
    monkeypatch.setattr(
        os, "remove", lambda p, *a, **k: (hit(str(p)), real_remove(p, *a, **k))[1]
    )
    monkeypatch.setattr(
        os,
        "replace",
        lambda s, d, *a, **k: (hit(str(s), str(d)), real_replace(s, d, *a, **k))[1],
    )
    monkeypatch.setattr(
        json,
        "dump",
        lambda o, fp, *a, **k: (hit(getattr(fp, "name", "")), real_dump(o, fp, *a, **k))[1],
    )

    # seed a published dataset so every crash point has OLD state to corrupt
    # (different shard count, so a stale manifest can never match new shards)
    state["armed"] = False
    export.export_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=2)
    old_bytes = _wds_digest(out)

    k, crash_points = 1, 0
    while True:
        state.update(crash_at=k, count=0, armed=True)
        crashed = False
        try:
            export.export_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=4)
        except SimulatedCrash:
            crashed = True
        finally:
            state["armed"] = False
        if crashed:
            # the loader must refuse this state loudly OR serve the intact
            # OLD snapshot (a crash before the first mutation changes
            # nothing — that IS the atomic contract); never an old/new mix
            try:
                got = {k2: g["txt"] for k2, g in export.iter_webdataset(out)}
            except (FileNotFoundError, ValueError):
                pass  # loud refusal — the expected post-first-mutation state
            else:
                assert got == want_samples and _wds_digest(out) == old_bytes, (
                    f"crash point {k} served a torn sample set"
                )
            # recovery: a plain re-export converges to from-scratch bytes
            export.export_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=4)
        assert _wds_digest(out) == want_bytes, f"crash point {k} did not converge"
        assert {k2: g["txt"] for k2, g in export.iter_webdataset(out)} == want_samples
        if not crashed:
            break
        crash_points += 1
        k += 1
    # must have exercised the real boundaries: manifest invalidation,
    # stale-shard removes, json.dump, os.replace
    assert crash_points >= 4, f"only {crash_points} boundaries found"
