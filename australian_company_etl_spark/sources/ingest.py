"""Fault-tolerant ingestion — the crawl-grade JSON/CSV read path.

The reference's extractor wraps every record parse in try/except and
counts failures (extract_commoncrawl.py:40-63: malformed WARC/JSON
records are skipped, not fatal). Spark-first, that contract is PERMISSIVE
parsing with an explicit `_corrupt_record` column: one scan family yields
BOTH the parsed rows and a quarantine frame, no Python loop.

Scale posture: the split is a column filter over the parsed scan — both
outputs prune from the same source and NOTHING is cached (pinning the
whole raw input in executor storage for the session's lifetime is worse
at an ingest boundary than letting each output re-scan; the quarantine
path costs nothing when everything parses). FAILFAST remains the right
mode for curated internal tables; PERMISSIVE + quarantine is for ingest
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
    quarantined if it is unparseable, type-corrupt, OR parses to all-null
    schema fields — the last case is the renamed-upstream-field hazard:
    `{"other": 99}` parses "successfully" against `id bigint, name string`
    with every field null, so without the all-null clause a systematically
    renamed feed floods `good` with all-null rows while the quarantine
    count (the monitoring signal) stays at zero.

    Built as text + `from_json` (not the file JSON reader): the raw line is
    then a real column, so all-null records — which PERMISSIVE does NOT
    mark corrupt — still land in the quarantine with their verbatim bytes,
    and the split needs no cache (the file reader refuses corrupt-only
    queries unless the whole input is cached)."""
    parsed = spark.read.text(path).select(
        "value",
        F.from_json(
            "value",
            f"{schema}, {CORRUPT_COL} string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("s"),
    )
    fields = [c for c in parsed.select("s.*").columns if c != CORRUPT_COL]
    quarantined = F.col(f"s.{CORRUPT_COL}").isNotNull() | F.coalesce(
        *[F.col(f"s.{c}").cast("string") for c in fields]
    ).isNull()
    good = parsed.filter(~quarantined).select(*[f"s.{c}" for c in fields])
    bad = parsed.filter(quarantined).select(F.col("value").alias("raw_line"))
    return good, bad


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of read_json_quarantine (malformed = wrong arity/type).

    CSV is positional, so the JSON reader's renamed-field hazard (a
    successful all-null parse) cannot occur — only blank lines parse
    all-null, and those stay in `good` as explicit empty rows; the
    quarantine condition is the corrupt column alone. `quarantine` carries
    the raw line plus the best-effort parsed fields (the extra columns also
    lift Spark's corrupt-only query restriction, so the split needs no
    cache)."""
    full = f"{schema}, {CORRUPT_COL} string"
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", header)
        .csv(path)
    )
    fields = [c for c in raw.columns if c != CORRUPT_COL]
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"), *fields
    )
    return good, bad
