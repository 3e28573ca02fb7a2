"""Group N — deterministic sampling & dataset splits for training pipelines.

A training-data pipeline needs repeatable sampling: re-running the job on
the same corpus must pick the same rows (no RNG state, no partition-order
dependence). Both operators key on the portable 60-bit md5 hash of the
stable row id, so the choice is a pure function of the data and is
embarrassingly parallel — no shuffle at all for N1 (pure filter, pushes
into the scan stage), one count-aggregation for N2.

- N1 `sample_stratified_hash` — 20% per-source sample of documents:
  keep rows with hash(doc_id)/2^60 < 0.2. Uniform per stratum because the
  hash is independent of `source`; exactly reproducible across engines,
  runs, and cluster sizes (unlike `df.sample`, which is seed+partition-
  layout dependent).
- N2 `split_train_holdout` — 90/5/5 train/valid/test assignment by hash
  bucket (h mod 100), reported as per-(source, split) counts. The split of
  any given doc never changes as the corpus grows — the property that
  keeps eval sets stable across dataset versions.

Reference parity: the reference's processed-file ledger
(extract_commoncrawl.py:89-93) is the same idea — membership decided by a
stable key, not by run order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from australian_company_etl_spark.functions.textfns import phash_sql, phash_spark
from australian_company_etl_spark.sources.registry import load_tables

# floor(0.2 * 2^60): compare hashes as exact BIGINTs, never via doubles
SAMPLE_THRESHOLD = (1 << 60) // 5


def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 — deterministic 20% hash-sample of documents (uniform per source)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    h = phash_spark(F.col("doc_id").cast("string"))
    return docs.filter(h < SAMPLE_THRESHOLD).select("doc_id", "source", "lang", "n_chars")


SAMPLE_SQL = f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE {phash_sql("doc_id::VARCHAR")} < {SAMPLE_THRESHOLD}
"""


def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — 90/5/5 train/valid/test split by hash bucket, counts per source."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    bucket = phash_spark(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "valid").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


SPLIT_SQL = f"""
SELECT source,
       CASE WHEN {phash_sql("doc_id::VARCHAR")} % 100 < 90 THEN 'train'
            WHEN {phash_sql("doc_id::VARCHAR")} % 100 < 95 THEN 'valid'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


QUERIES = {
    "sample_stratified_hash": sample_stratified_hash,
    "split_train_holdout": split_train_holdout,
}

ORACLES = {
    "sample_stratified_hash": SAMPLE_SQL,
    "split_train_holdout": SPLIT_SQL,
}
