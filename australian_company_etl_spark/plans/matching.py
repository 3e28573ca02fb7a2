"""Group B — normalization & entity matching (reference t3,
scripts/entity_matching.py). Testdata stand-ins: supplier ≈ staging_abr
(keyed registry), customer ≈ staging_commoncrawl (crawled candidates),
part names ≈ free-text company names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from australian_company_etl_spark.functions.normalize import norm_name_spark, norm_name_sql
from australian_company_etl_spark.functions.textfns import (
    jaccard_pct_spark,
    jaccard_pct_sql,
    lev_ratio_spark,
    lev_ratio_sql,
    tokens_spark,
    tokens_sql,
)
from australian_company_etl_spark.operators.matching import (
    best_fuzzy_match,
    blocked_fuzzy_pairs,
)
from australian_company_etl_spark.sources.registry import load_tables

FUZZY_THRESHOLD = 50
JACCARD_THRESHOLD = 30


def norm_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — normalize_name over part names (entity_matching.py:74-97)."""
    part = load_tables(spark, sf_dir, ["part"])["part"]
    return part.select(
        "p_partkey",
        "p_name",
        norm_name_spark(F.col("p_name")).alias("norm_name"),
    )


NORM_NAMES_SQL = f"""
SELECT p_partkey, p_name, {norm_name_sql('p_name')} AS norm_name
FROM part
"""


def match_exact_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — exact key join (≈ direct ABN join) + per-entity rollup."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )


MATCH_EXACT_SQL = """
SELECT c_custkey, c_name, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_spend
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def match_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — extractOne semantics (entity_matching.py:405-425): best
    levenshtein-ratio customer per supplier, candidate set broadcast."""
    t = load_tables(spark, sf_dir, ["supplier", "customer"])
    left = t["supplier"].select(
        "s_suppkey", norm_name_spark(F.col("s_name")).alias("s_norm")
    )
    right = t["customer"].select(
        "c_custkey", norm_name_spark(F.col("c_name")).alias("c_norm")
    )
    return best_fuzzy_match(left, right, "s_suppkey", "s_norm", "c_custkey", "c_norm").select(
        "s_suppkey", "c_custkey", "score"
    )


MATCH_FUZZY_SQL = f"""
WITH l AS (SELECT s_suppkey, {norm_name_sql('s_name')} AS s_norm FROM supplier),
     r AS (SELECT c_custkey, {norm_name_sql('c_name')} AS c_norm FROM customer),
     scored AS (
       SELECT s_suppkey, c_custkey, {lev_ratio_sql('s_norm', 'c_norm')} AS score,
              row_number() OVER (PARTITION BY s_suppkey
                                 ORDER BY {lev_ratio_sql('s_norm', 'c_norm')} DESC,
                                          c_custkey ASC) AS rn
       FROM l CROSS JOIN r
     )
SELECT s_suppkey, c_custkey, score FROM scored WHERE rn = 1
"""


def match_keyword_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 — keyword-overlap Jaccard score (entity_matching.py:142-170):
    DISTINCT part names (the reference matches unique entity names, and
    deduping first keeps pair-gen sub-quadratic in row duplication — the
    100 TB posture), blocked on the last word, Jaccard ≥ threshold."""
    part = load_tables(spark, sf_dir, ["part"])["part"]
    base = part.select("p_name").distinct().select(
        F.col("p_name").alias("name"),
        tokens_spark(F.col("p_name")).alias("toks"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
    )
    a = base.select(F.col("name").alias("name_a"), F.col("toks").alias("toks_a"), "block")
    b = base.select(F.col("name").alias("name_b"), F.col("toks").alias("toks_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("jaccard_pct", jaccard_pct_spark(F.col("toks_a"), F.col("toks_b")))
        .filter(F.col("jaccard_pct") >= JACCARD_THRESHOLD)
        .select("name_a", "name_b", "jaccard_pct")
    )


MATCH_KEYWORD_SQL = f"""
WITH base AS (
  SELECT p_name AS name, {tokens_sql('p_name')} AS toks,
         string_split(p_name, ' ')[-1] AS block
  FROM (SELECT DISTINCT p_name FROM part)
)
SELECT a.name AS name_a, b.name AS name_b,
       {jaccard_pct_sql('a.toks', 'b.toks')} AS jaccard_pct
FROM base a JOIN base b ON a.block = b.block AND a.name < b.name
WHERE {jaccard_pct_sql('a.toks', 'b.toks')} >= {JACCARD_THRESHOLD}
"""


def match_blocked_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 — the 100 TB fuzzy-join plan: block on nation key (equi-join,
    never cartesian), then levenshtein-ratio score ≥ threshold."""
    t = load_tables(spark, sf_dir, ["supplier", "customer"])
    left = t["supplier"].select(
        "s_suppkey",
        F.col("s_nationkey").alias("nationkey"),
        norm_name_spark(F.col("s_name")).alias("s_norm"),
    )
    right = t["customer"].select(
        "c_custkey",
        F.col("c_nationkey").alias("nationkey"),
        norm_name_spark(F.col("c_name")).alias("c_norm"),
    )
    return blocked_fuzzy_pairs(left, right, ["nationkey"], "s_norm", "c_norm", FUZZY_THRESHOLD).select(
        "s_suppkey", "c_custkey", "nationkey", "score"
    )


MATCH_BLOCKED_SQL = f"""
WITH l AS (SELECT s_suppkey, s_nationkey AS nationkey,
                  {norm_name_sql('s_name')} AS s_norm FROM supplier),
     r AS (SELECT c_custkey, c_nationkey AS nationkey,
                  {norm_name_sql('c_name')} AS c_norm FROM customer)
SELECT s_suppkey, c_custkey, l.nationkey AS nationkey,
       {lev_ratio_sql('s_norm', 'c_norm')} AS score
FROM l JOIN r USING (nationkey)
WHERE {lev_ratio_sql('s_norm', 'c_norm')} >= {FUZZY_THRESHOLD}
"""


def unify_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 — full t3 pipeline: normalize → block → score → threshold →
    best-per-left → first-wins keyed insert with merged_confidence
    (entity_matching.py:311-515 end-to-end)."""
    t = load_tables(spark, sf_dir, ["supplier", "customer"])
    left = t["supplier"].select(
        "s_suppkey",
        "s_name",
        F.col("s_nationkey").alias("nationkey"),
        norm_name_spark(F.col("s_name")).alias("s_norm"),
    )
    right = t["customer"].select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").alias("nationkey"),
        norm_name_spark(F.col("c_name")).alias("c_norm"),
    )
    scored = blocked_fuzzy_pairs(left, right, ["nationkey"], "s_norm", "c_norm", FUZZY_THRESHOLD)
    w = Window.partitionBy("s_suppkey").orderBy(F.desc("score"), F.asc("c_custkey"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("s_suppkey").alias("abn"),
            F.col("s_name").alias("entity_name"),
            F.col("c_custkey").alias("matched_key"),
            F.col("c_name").alias("matched_name"),
            F.col("score").alias("merged_confidence"),
        )
    )


UNIFY_SQL = f"""
WITH l AS (SELECT s_suppkey, s_name, s_nationkey AS nationkey,
                  {norm_name_sql('s_name')} AS s_norm FROM supplier),
     r AS (SELECT c_custkey, c_name, c_nationkey AS nationkey,
                  {norm_name_sql('c_name')} AS c_norm FROM customer),
     scored AS (
       SELECT s_suppkey, s_name, c_custkey, c_name,
              {lev_ratio_sql('s_norm', 'c_norm')} AS score
       FROM l JOIN r USING (nationkey)
       WHERE {lev_ratio_sql('s_norm', 'c_norm')} >= {FUZZY_THRESHOLD}
     ),
     ranked AS (
       SELECT *, row_number() OVER (PARTITION BY s_suppkey
                                    ORDER BY score DESC, c_custkey ASC) AS rn
       FROM scored
     )
SELECT s_suppkey AS abn, s_name AS entity_name, c_custkey AS matched_key,
       c_name AS matched_name, score AS merged_confidence
FROM ranked WHERE rn = 1
"""


QUERIES = {
    "norm_names": norm_names,
    "match_exact_key": match_exact_key,
    "match_fuzzy_levenshtein": match_fuzzy_levenshtein,
    "match_keyword_jaccard": match_keyword_jaccard,
    "match_blocked_fuzzy": match_blocked_fuzzy,
    "unify_entities": unify_entities,
}

ORACLES = {
    "norm_names": NORM_NAMES_SQL,
    "match_exact_key": MATCH_EXACT_SQL,
    "match_fuzzy_levenshtein": MATCH_FUZZY_SQL,
    "match_keyword_jaccard": MATCH_KEYWORD_SQL,
    "match_blocked_fuzzy": MATCH_BLOCKED_SQL,
    "unify_entities": UNIFY_SQL,
}
