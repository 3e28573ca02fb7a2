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
