"""Group A — extract/ingest (reference t1+t2).

- A1: regex field extraction from raw text ≈ the `<title>`/`<meta industry>`
  grab in extract_commoncrawl.py:26-50, as pushdown-friendly column exprs.
- A2: source filter + processed-files ledger anti-join ≈ the `.au` URL
  filter and `processed_files` skip logic (extract_commoncrawl.py:66,89-93).
- A3: nested-record parse to typed columns ≈ the ABR XML iterparse field
  extraction (extract_abr.py:107-148), on the events.props JSON column.
- A4: first-row-wins keyed upsert ≈ `ON CONFLICT (abn) DO NOTHING`
  (extract_abr.py:57-66) under explicit deterministic insertion order.

Scale: A1/A3 are stateless column expressions (codegen, no shuffle); A2 is
a broadcast-able anti-join on the ledger; A4 is one window shuffle on the
key — the same plan shape works on a 100 TB ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from australian_company_etl_spark.functions.normalize import (
    title_company_spark,
    title_company_sql,
    valid_name_spark,
    valid_name_sql,
)
from australian_company_etl_spark.operators.matching import first_wins
from australian_company_etl_spark.sources.registry import load_tables

TITLE_RE = r"^(\w+ \w+ \w+)"
INDUSTRY_RE = r"(spark \w+)"


def extract_regex_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — title/industry regex grab over raw document text."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return docs.select(
        "doc_id",
        F.nullif(F.regexp_extract(F.col("text"), TITLE_RE, 1), F.lit("")).alias("title"),
        F.nullif(F.regexp_extract(F.col("text"), INDUSTRY_RE, 1), F.lit("")).alias("industry"),
    )


EXTRACT_REGEX_SQL = f"""
SELECT doc_id,
       nullif(coalesce(regexp_extract(text, '{TITLE_RE}', 1), ''), '') AS title,
       nullif(coalesce(regexp_extract(text, '{INDUSTRY_RE}', 1), ''), '') AS industry
FROM documents
"""


def extract_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — domain filter + processed-file ledger skip (anti-join)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    ledger = (
        docs.filter(F.col("doc_id") % 100 == 0).select("source").distinct()
    )
    return (
        docs.filter(F.col("lang") == "en")
        .join(F.broadcast(ledger), "source", "left_anti")
        .select("doc_id", "source")
    )


URL_FILTER_SQL = """
SELECT doc_id, source
FROM documents
WHERE lang = 'en'
  AND source NOT IN (SELECT DISTINCT source FROM documents WHERE doc_id % 100 = 0)
"""


def extract_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — nested-record parse to typed columns + rollup."""
    events = load_tables(spark, sf_dir, ["events"])["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.sum("k").alias("sum_k"),
        )
    )


JSON_PROPS_SQL = """
SELECT event_type, count(*) AS n,
       round(avg(k), 2) AS avg_k, CAST(sum(k) AS BIGINT) AS sum_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
"""


def extract_first_wins_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — ON CONFLICT DO NOTHING: first order per customer in key order."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    return first_wins(orders, ["o_custkey"], [F.asc("o_orderkey")]).select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderstatus",
    )


FIRST_WINS_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn = 1
"""


def extract_xml_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — ABR-style XML record parse (extract_abr.py:107-148): each row
    carries one XML record; Spark's native `from_xml` parses it to typed
    columns in one codegen expression — the declarative replacement for the
    reference's ElementTree iterparse loop. The XML is synthesized from
    customer rows so the oracle can parse the identical strings.

    Scale: stateless per-row parse, no shuffle; at 100 TB this is
    `spark.read.format('xml')` with rowTag over the raw files — same
    expression, streaming-scan input."""
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    xml = F.concat(
        F.lit("<abr><abn>"),
        F.col("c_custkey"),
        F.lit("</abn><name>"),
        F.col("c_name"),
        F.lit("</name><segment>"),
        F.col("c_mktsegment"),
        F.lit("</segment></abr>"),
    )
    parsed = F.from_xml(xml, "abn BIGINT, name STRING, segment STRING")
    return (
        cust.select(parsed.alias("r"))
        .select("r.abn", "r.name", "r.segment")
        .filter(F.col("segment") == "BUILDING")
    )


EXTRACT_XML_SQL = """
SELECT CAST(regexp_extract(x, '<abn>([0-9]+)</abn>', 1) AS BIGINT) AS abn,
       -- trim: Spark's from_xml strips surrounding whitespace from element
       -- text (ignoreSurroundingSpaces defaults true), so a '   ' name
       -- parses as '' — the raw regexp capture kept the spaces and diverged
       -- (round-9 hostile-names regime finding)
       trim(regexp_extract(x, '<name>(.*)</name>', 1)) AS name,
       trim(regexp_extract(x, '<segment>(.*)</segment>', 1)) AS segment
FROM (
  SELECT '<abr><abn>' || c_custkey || '</abn><name>' || c_name
         || '</name><segment>' || c_mktsegment || '</segment></abr>' AS x
  FROM customer
)
WHERE regexp_extract(x, '<segment>(.*)</segment>', 1) = 'BUILDING'
"""


# ── A7/A8: title → company-name extraction + validity filter ────────────────
# (entity_matching.py:99-120, 121-141). The corpus has no page titles, so —
# exactly like A6 synthesizes XML — deterministic title strings are built
# from each document's leading words, cycling through shapes that exercise
# every fallback branch: suffix-at-start, suffix-after-preamble, name-before-
# separator, bare name, and three crawl-noise shapes (LOGIN page, numeric
# error title, RSS feed). The oracle builds the identical strings and runs
# the identical (?i) regex chain. Stateless per-row codegen, no shuffle.


def _title_col_spark():
    base = F.coalesce(F.regexp_extract(F.col("text"), TITLE_RE, 1), F.lit(""))
    m = F.col("doc_id") % 7
    return (
        F.when(m == 0, F.concat(base, F.lit(" ltd")))
        .when(m == 1, F.concat(F.lit("Welcome to "), base, F.lit(" company")))
        .when(m == 2, F.concat(base, F.lit(" - Official Site")))
        .when(m == 3, base)
        .when(m == 4, F.lit("LOGIN"))
        .when(m == 5, F.lit("404 - 500"))
        .otherwise(F.lit("RSS Feed - Latest News"))
    )


_TITLE_COL_SQL = f"""CASE doc_id % 7
  WHEN 0 THEN coalesce(regexp_extract(text, '{TITLE_RE}', 1), '') || ' ltd'
  WHEN 1 THEN 'Welcome to ' || coalesce(regexp_extract(text, '{TITLE_RE}', 1), '') || ' company'
  WHEN 2 THEN coalesce(regexp_extract(text, '{TITLE_RE}', 1), '') || ' - Official Site'
  WHEN 3 THEN coalesce(regexp_extract(text, '{TITLE_RE}', 1), '')
  WHEN 4 THEN 'LOGIN'
  WHEN 5 THEN '404 - 500'
  ELSE 'RSS Feed - Latest News' END"""


def extract_title_company(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — ordered-fallback company-name extraction from page titles
    (extract_company_name_from_title, entity_matching.py:99-120)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    return docs.select(
        "doc_id",
        _title_col_spark().alias("title"),
    ).select("doc_id", "title", title_company_spark(F.col("title")).alias("company"))


EXTRACT_TITLE_SQL = f"""
SELECT doc_id, title, {title_company_sql('title')} AS company
FROM (SELECT doc_id, {_TITLE_COL_SQL} AS title FROM documents)
"""


def filter_valid_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — company-name validity flag over the A7 extraction
    (is_valid_company_name, entity_matching.py:121-141): web-noise names
    (LOGIN, RSS ..., digits-only, letterless) are marked invalid before the
    match stage."""
    ext = extract_title_company(spark, sf_dir)
    return ext.select(
        "doc_id",
        F.col("company").alias("name"),
        valid_name_spark(F.col("company")).alias("valid"),
    )


FILTER_VALID_SQL = f"""
SELECT doc_id, company AS name, {valid_name_sql('company')} AS valid
FROM ({EXTRACT_TITLE_SQL})
"""


QUERIES = {
    "extract_regex_fields": extract_regex_fields,
    "extract_title_company": extract_title_company,
    "filter_valid_names": filter_valid_names,
    "extract_url_filter": extract_url_filter,
    "extract_json_props": extract_json_props,
    "extract_first_wins_upsert": extract_first_wins_upsert,
    "extract_xml_fields": extract_xml_fields,
}

ORACLES = {
    "extract_regex_fields": EXTRACT_REGEX_SQL,
    "extract_title_company": EXTRACT_TITLE_SQL,
    "filter_valid_names": FILTER_VALID_SQL,
    "extract_url_filter": URL_FILTER_SQL,
    "extract_json_props": JSON_PROPS_SQL,
    "extract_first_wins_upsert": FIRST_WINS_SQL,
    "extract_xml_fields": EXTRACT_XML_SQL,
}
