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
