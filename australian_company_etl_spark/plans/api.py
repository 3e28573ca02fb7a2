"""Group D — query/API surface (reference fastapi_service/main.py).

Each endpoint becomes a DataFrame plan. At scale these are the
point-lookup / secondary-index access paths: the key filter pushes down to
the parquet scan (row-group pruning); the ILIKE scan is a full-column scan
exactly like the reference's un-indexed ILIKE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from australian_company_etl_spark.sources.registry import load_tables

LOOKUP_KEY = 42
SEARCH_PATTERN = "widget"
STATE_NAME = "NATION_3"


def api_lookup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — GET /companies/{abn}: point lookup by key (main.py:15-38)."""
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    return (
        t["customer"]
        .filter(F.col("c_custkey") == LOOKUP_KEY)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name")
    )


LOOKUP_SQL = f"""
SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS c_acctbal, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey = {LOOKUP_KEY}
"""


def api_search_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — GET /companies/search: case-insensitive substring (main.py:40-49)."""
    part = load_tables(spark, sf_dir, ["part"])["part"]
    return part.filter(F.lower(F.col("p_name")).contains(SEARCH_PATTERN.lower())).select(
        "p_partkey", "p_name", "p_brand"
    )


SEARCH_SQL = f"""
SELECT p_partkey, p_name, p_brand
FROM part WHERE lower(p_name) LIKE '%{SEARCH_PATTERN}%'
"""


def api_by_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — GET /companies/by_state: categorical filter via dim join
    (main.py:51-59)."""
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    nat = t["nation"].filter(F.col("n_name") == STATE_NAME)
    return (
        t["customer"]
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name")
    )


BY_STATE_SQL = f"""
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE n_name = '{STATE_NAME}'
"""


QUERIES = {
    "api_lookup_by_key": api_lookup_by_key,
    "api_search_ilike": api_search_ilike,
    "api_by_state": api_by_state,
}

ORACLES = {
    "api_lookup_by_key": LOOKUP_SQL,
    "api_search_ilike": SEARCH_SQL,
    "api_by_state": BY_STATE_SQL,
}
