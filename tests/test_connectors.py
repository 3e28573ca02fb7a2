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
