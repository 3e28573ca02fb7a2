"""Fault-tolerant ingestion — the crawl-grade JSON/CSV read path.

The reference's extractor wraps every record parse in try/except and
counts failures (extract_commoncrawl.py:40-63: malformed WARC/JSON
records are skipped, not fatal). Spark-first, that contract is the
reader's PERMISSIVE mode with an explicit `_corrupt_record` column:
one pass yields BOTH the parsed rows and a quarantine frame, no Python
loop, no second read of the raw bytes.

Scale posture: the split is a column filter on the already-materialized
corrupt column — both outputs prune from one scan (the quarantine path
costs nothing when everything parses). FAILFAST remains the right mode
for curated internal tables; PERMISSIVE + quarantine is for ingest
boundaries where one bad upstream line must not kill a 100 TB job, and
the quarantine row count is the monitoring signal (C-group checks run
over it like any other table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_json_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with `schema`; returns (good, quarantine).

    `good` carries only the schema columns (parsed rows); `quarantine`
    carries the raw offending line for replay/inspection. A record is
    quarantined if it is unparseable OR parses to all-null schema fields
    (PERMISSIVE marks both by populating the corrupt column)."""
    full = f"{schema}, {CORRUPT_COL} string"
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # caching before the split is the documented contract for referencing
    # the corrupt column (Spark refuses raw-only queries on it otherwise)
    raw = raw.cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of read_json_quarantine (malformed = wrong arity/type)."""
    full = f"{schema}, {CORRUPT_COL} string"
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", header)
        .csv(path)
    )
    raw = raw.cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
