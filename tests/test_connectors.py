"""A5 — source/sink connector round-trips: parquet, csv, json, partitioned."""

from __future__ import annotations

from pyspark.sql import functions as F

from australian_company_etl_spark.sources.registry import load_tables


def _canon(df, key):
    return sorted(tuple(str(c) for c in r) for r in df.collect())


def test_csv_round_trip(spark, sf_dir, tmp_path):
    nation = load_tables(spark, sf_dir, ["nation"])["nation"]
    path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).option("inferSchema", True).csv(path)
    assert _canon(back, "n_nationkey") == _canon(nation, "n_nationkey")


def test_json_round_trip(spark, sf_dir, tmp_path):
    region = load_tables(spark, sf_dir, ["region"])["region"]
    path = str(tmp_path / "region_json")
    region.write.mode("overwrite").json(path)
    back = spark.read.json(path).select(*region.columns)
    assert _canon(back, "r_regionkey") == _canon(region, "r_regionkey")


def test_partitioned_parquet_write_prunes(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    path = str(tmp_path / "orders_part")
    orders.withColumn("status", F.col("o_orderstatus")).write.mode("overwrite").partitionBy(
        "status"
    ).parquet(path)
    back = spark.read.parquet(path)
    one = back.filter(F.col("status") == "F")
    # partition pruning: the physical plan must carry the partition filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    expect = orders.filter(F.col("o_orderstatus") == "F").count()
    assert one.count() == expect


def test_text_round_trip(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].select("text")
    path = str(tmp_path / "docs_text")
    docs.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    assert back.count() == docs.count()


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """A dataset whose later shards gained a column must read as the union
    schema with nulls backfilled for old shards — the additive schema
    evolution every long-lived 100 TB lake dataset goes through."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    path = str(tmp_path / "evolving")
    v1 = docs.select("doc_id", "text").filter(F.col("doc_id") < 250)
    v2 = (
        docs.select("doc_id", "text", F.col("lang").alias("lang_tag"))
        .filter(F.col("doc_id") >= 250)
    )
    v1.write.mode("overwrite").parquet(path + "/batch=1")
    v2.write.mode("overwrite").parquet(path + "/batch=2")

    back = spark.read.option("mergeSchema", True).parquet(path)
    assert {"doc_id", "text", "lang_tag", "batch"} <= set(back.columns)
    assert back.count() == docs.count()
    old = back.filter(F.col("batch") == 1)
    assert old.filter(F.col("lang_tag").isNotNull()).count() == 0, (
        "pre-evolution shards must backfill the new column with nulls"
    )
    new = back.filter(F.col("batch") == 2)
    assert new.filter(F.col("lang_tag").isNull()).count() == 0


def test_json_quarantine_splits_good_and_bad(spark, tmp_path):
    from australian_company_etl_spark.sources.ingest import read_json_quarantine

    path = str(tmp_path / "feed.jsonl")
    lines = [
        '{"id": 1, "name": "acme"}',
        'this is not json at all',
        '{"id": 2, "name": "widgetco"}',
        '{"id": "NOT_A_NUMBER", "name": "badtype"}',
        '{"id": 3, "name": "third"}',
        '{broken json',
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    good, bad = read_json_quarantine(spark, path, "id bigint, name string")
    assert sorted((r.id, r.name) for r in good.collect()) == [
        (1, "acme"), (2, "widgetco"), (3, "third"),
    ] or sorted((r.id, r.name) for r in good.collect()) == sorted(
        [(1, "acme"), (2, "widgetco"), (3, "third")]
    )
    bad_lines = sorted(r.raw_line for r in bad.collect())
    assert len(bad_lines) == 3
    assert "{broken json" in bad_lines
    assert "this is not json at all" in bad_lines
    # the bad-type line is preserved verbatim for replay
    assert any("NOT_A_NUMBER" in b for b in bad_lines)
    # good frame carries only schema columns
    assert good.columns == ["id", "name"]


def test_csv_quarantine_catches_bad_types(spark, tmp_path):
    from australian_company_etl_spark.sources.ingest import read_csv_quarantine

    path = str(tmp_path / "feed.csv")
    with open(path, "w") as f:
        f.write("id,qty\n1,10\nnope,20\n3,thirty\n4,40\n")
    good, bad = read_csv_quarantine(spark, path, "id bigint, qty bigint")
    assert sorted((r.id, r.qty) for r in good.collect()) == [(1, 10), (4, 40)]
    assert sorted(r.raw_line for r in bad.collect()) == ["3,thirty", "nope,20"]


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/source parity: values survive the round trip and a filtered
    read-back pushes the predicate into the ORC scan (PushedFilters)."""
    from australian_company_etl_spark.sources.export import export_orc

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    path = str(tmp_path / "orders_orc")
    export_orc(orders, path)
    back = spark.read.orc(path).select(*orders.columns)
    assert _canon(back, "o_orderkey") == _canon(orders, "o_orderkey")
    plan = (
        spark.read.orc(path)
        .filter("o_orderkey = 42")
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:200]


def test_json_quarantine_catches_allnull_parse(spark, tmp_path):
    """The renamed-upstream-field hazard (CONFIRMED review finding): a
    record that parses 'successfully' to all-null schema fields must land
    in the quarantine WITH its raw line, not flood `good` with null rows
    while the monitoring count stays zero."""
    from australian_company_etl_spark.sources.ingest import read_json_quarantine

    path = str(tmp_path / "feed.jsonl")
    lines = [
        '{"id": 1, "name": "acme"}',
        '{"other": 99}',
        '{"id": null, "name": null}',
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    good, bad = read_json_quarantine(spark, path, "id bigint, name string")
    assert [(r.id, r.name) for r in good.collect()] == [(1, "acme")]
    assert sorted(r.raw_line for r in bad.collect()) == [
        '{"id": null, "name": null}',
        '{"other": 99}',
    ]


def test_load_tables_empty_list_loads_nothing(spark, sf_dir):
    """An explicitly-empty table list means 'load nothing' — the falsy-[]
    branch used to load all ten tables (review finding)."""
    from australian_company_etl_spark.sources.registry import load_tables

    assert load_tables(spark, sf_dir, []) == {}
