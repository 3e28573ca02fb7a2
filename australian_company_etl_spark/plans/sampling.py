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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from australian_company_etl_spark.functions.partitioning import spread_if_narrow
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


PACK_BUDGET = 512  # tokens per packed training sequence

# [\s\v]+, not \s+: Java \s includes vertical tab, RE2's does not (see
# TOKEN_COUNT_SQL in plans/text.py — hostile_docs regime finding)
_WS_TOKENS_SQL = "len(list_filter(string_split_regex(trim(text), '[\\s\\v]+'), x -> x <> ''))::BIGINT"


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 — deterministic sequence packing: within each source, documents
    (in doc_id order) are appended into fixed token-budget bins; a doc's
    bin is floor(tokens-before-it / budget). Pure window arithmetic over
    exact integer token counts — the same packing on every engine and
    cluster layout.

    Scale: one shuffle on `source`; at 100 TB you sub-bucket the window key
    (source, doc_id div B) to keep window partitions bounded — assignments
    are unchanged because the cumulative sum telescopes."""
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    n_tokens = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    ).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn("cum_before", cum_before)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            # integer `div`, matching the oracle's BIGINT `//`: double
            # division would lose exactness past 2^53 cumulative tokens
            F.expr(f"cum_before div {PACK_BUDGET}").cast("bigint").alias("bin_id"),
        )
    )


PACK_SQL = f"""
WITH t AS (SELECT doc_id, source, {_WS_TOKENS_SQL} AS n_tokens FROM documents)
SELECT doc_id, source, n_tokens::INT AS n_tokens,
       (coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        // {PACK_BUDGET})::BIGINT AS bin_id
FROM t
"""


# corpus-mixing rates per source (basis points of 2^60-hash space, exact
# integer thresholds — no float compare anywhere)
MIX_RATES_BP = {"src0": 10000, "src1": 7500, "src2": 5000, "src3": 2500}
MIX_DEFAULT_BP = 1000


def mix_corpus_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — weighted corpus mixing: per-source keep rates (e.g. books 1.0,
    web 0.1) applied as a deterministic hash filter — the up/down-sampling
    step that composes a pretraining mixture. Shuffle-free: a pure filter
    with per-source integer thresholds."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    bucket = phash_spark(F.col("doc_id").cast("string")) % 10000
    thr = F.lit(MIX_DEFAULT_BP)
    for src, bp in MIX_RATES_BP.items():
        thr = F.when(F.col("source") == src, F.lit(bp)).otherwise(thr)
    return docs.filter(bucket < thr).select("doc_id", "source", "lang")


def _mix_sql() -> str:
    whens = " ".join(f"WHEN '{s}' THEN {bp}" for s, bp in MIX_RATES_BP.items())
    return f"""
SELECT doc_id, source, lang
FROM documents
WHERE {phash_sql("doc_id::VARCHAR")} % 10000
      < (CASE source {whens} ELSE {MIX_DEFAULT_BP} END)
"""


def mix_corpus_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N8 — temperature-scaled corpus mixing (the multilingual/multi-source
    sampling rule, α = 0.5): final counts ∝ n_s^α, so dominant sources are
    damped and small sources keep everything. Keep-rate per source is
    r_s = √(n_min / n_s) (the α = 0.5 instance of C·n_s^{α−1}, normalized
    so the smallest source keeps 100%), applied as the same deterministic
    hash-threshold filter as N4 — but with DATA-DERIVED rates instead of
    config constants.

    α is fixed at 0.5 deliberately: sqrt is correctly rounded under IEEE
    754 (libm `pow` for fractional exponents is not), so both engines
    compute the identical double and the identical floor(r·10⁴) basis-point
    threshold — no boundary ulp can flip a doc's keep decision.

    Scale: one map-side-combined count per source (tiny dim), broadcast
    back; the filter itself stays shuffle-free."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    counts = docs.groupBy("source").agg(F.count("*").alias("n_src"))
    n_min = counts.agg(F.min("n_src").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_src")) * 10000
        ).alias("thr_bp"),
    )
    bucket = phash_spark(F.col("doc_id").cast("string")) % 10000
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("thr_bp"))
        .select("doc_id", "source", F.col("thr_bp").cast("int").alias("thr_bp"))
    )


def _mix_temperature_sql() -> str:
    return f"""
WITH counts AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
n_min AS (SELECT min(n_src) AS n_min FROM counts),
rates AS (
  SELECT source, floor(sqrt(n_min::DOUBLE / n_src) * 10000) AS thr_bp
  FROM counts, n_min
)
SELECT d.doc_id, d.source, r.thr_bp::INT AS thr_bp
FROM documents d JOIN rates r USING (source)
WHERE {phash_sql("d.doc_id::VARCHAR")} % 10000 < r.thr_bp
"""


CHUNK_C = 64  # tokens per chunk
CHUNK_S = 48  # stride (16-token overlap)


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 — fixed-window token chunking with overlap: every document is cut
    into CHUNK_C-token windows every CHUNK_S tokens (the standard
    pretraining chunk/stride transform; the last window is short). Chunk
    membership is a pure function of (doc_id, token position) — stable
    across runs, engines, and cluster sizes.

    Scale: per-row array slicing, no shuffle at all — the transform runs
    where the scan runs. The per-doc chunk HOF is interpreted, but it
    slices ~n/S windows per doc (not per token), so the cost is linear in
    output size; the corpus-spread repartition keeps single-file local
    scans off one core."""
    from australian_company_etl_spark.functions.textfns import tokens_all_spark

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    docs = spread_if_narrow(docs, "doc_id")
    d = docs.select("doc_id", tokens_all_spark(F.col("text")).alias("t")).withColumn(
        "n", F.size("t")
    )
    # n_chunks = ((max(n-C,0) + S-1) div S) + 1  for n>0
    n_chunks = (
        F.expr(f"(greatest(n - {CHUNK_C}, 0) + {CHUNK_S - 1}) div {CHUNK_S}") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.alias("chunk_id"),
            F.concat_ws(" ", F.slice("t", k * CHUNK_S + 1, CHUNK_C)).alias("chunk_text"),
            F.least(F.lit(CHUNK_C), F.col("n") - k * CHUNK_S).alias("n_chunk_tokens"),
        ),
    )
    return (
        d.filter(F.col("n") > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_id", "c.chunk_text", "c.n_chunk_tokens")
    )


def _chunk_sql() -> str:
    """Token-fanout form, NOT slice-per-chunk: the earlier oracle unnested
    one row per chunk while CARRYING the full token list and list_slice'ing
    it per row — O(n²/S) per document in DuckDB (the round-10 shingle-SQL
    defect class), which HUNG on the round-11 long_doc regime's 1M-token
    document. Here each token fans out to the ≤ ⌈C/S⌉ chunks that contain
    it (k from ⌈(pos−C)/S⌉ to ⌊(pos−1)/S⌋, clamped to the chunk count) and
    chunks reassemble with an ordered string_agg — O(n·C/S) total, identical
    output."""
    from australian_company_etl_spark.functions.textfns import tokens_all_sql

    c, s = CHUNK_C, CHUNK_S
    return f"""
WITH toks AS (
  SELECT doc_id, {tokens_all_sql('text')} AS t FROM documents
), d AS (
  SELECT doc_id, t, len(t) AS n,
         ((greatest(len(t) - {c}, 0) + {s - 1}) // {s}) + 1 AS nc
  FROM toks WHERE len(t) > 0
), tok AS (
  SELECT doc_id, n, nc,
         unnest(t) AS w, unnest(range(1, n + 1)) AS pos
  FROM d
), tk AS (
  SELECT doc_id, n, w, pos,
         unnest(range(greatest(0, (pos - {c} + {s} - 1) // {s}),
                      least((pos - 1) // {s}, nc - 1) + 1)) AS k
  FROM tok
)
SELECT doc_id, k AS chunk_id,
       string_agg(w, ' ' ORDER BY pos) AS chunk_text,
       least({c}, any_value(n) - k * {s}) AS n_chunk_tokens
FROM tk
GROUP BY doc_id, k
"""


# ── N6: deterministic global shuffle + sharding ─────────────────────────────

NUM_SHARDS = 64


def shard_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6 — the training-data "global shuffle": every doc gets a
    pseudo-random but fully deterministic (shard_id, pos) address. Shard =
    hash bucket of the doc id, position = rank of the hash within the
    shard (doc_id tie-break), so adjacent source docs scatter across
    shards and re-running the job reproduces the exact order — unlike
    `df.orderBy(rand())`, which depends on seed + partition layout.

    Scale: one shuffle on shard_id (uniform by construction — the hash is
    the anti-skew guarantee); per-shard ranking is a window over ~N/64
    rows. At 100 TB you write shard_id as the output partition column and
    readers stream shards independently.
    """
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    h = phash_spark(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    from pyspark.sql import Window

    base = docs.select("doc_id", "source", h.alias("h"))
    w = Window.partitionBy(F.col("h") % NUM_SHARDS).orderBy("h", "doc_id")
    return base.select(
        "doc_id",
        "source",
        (F.col("h") % NUM_SHARDS).cast("int").alias("shard_id"),
        F.row_number().over(w).alias("pos"),
    )


SHARD_SHUFFLE_SQL = f"""
SELECT doc_id, source,
       ({phash_sql("'shuf:' || doc_id::VARCHAR")} % {NUM_SHARDS})::INT AS shard_id,
       row_number() OVER (
         PARTITION BY {phash_sql("'shuf:' || doc_id::VARCHAR")} % {NUM_SHARDS}
         ORDER BY {phash_sql("'shuf:' || doc_id::VARCHAR")}, doc_id) AS pos
FROM documents
"""




# ── N7: weighted priority sampling ──────────────────────────────────────────

PRIORITY_K = 16
TWO60 = 1 << 60


def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N7 — priority sampling (Duffield, Lund & Thorup 2007): a
    weight-proportional without-replacement sample of K docs per source,
    weight = n_chars (long docs proportionally likelier — the "sample by
    token mass, not by document count" primitive corpus audits need).

    Priority q = w / u with u uniform in (0,1], kept top-K per stratum.
    Determinism and cross-engine exactness: u comes from the portable
    60-bit hash, and q is the exact integer quotient
    ``(w · 2^60) div max(h+1, w div 8 + 1)`` — the divisor clamp keeps the
    quotient < 2^63 (Spark's `div` yields BIGINT and silently wraps past
    it; the clamp binds with probability ~2^-50 and is applied identically
    in both dialects, so parity is exact even when it does). Numerator in
    DECIMAL(38,0)/HUGEINT. Ties (astronomically unlikely) break by doc_id.

    Scale: no shuffle for the priority computation (pure row expressions);
    the per-source top-K runs through the same WindowGroupLimit rank-filter
    pushdown as M1's KMV — each map task pre-prunes to its local top-K, so
    the shuffle carries O(K · tasks) rows per stratum, not the corpus."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    h = phash_spark(F.col("doc_id").cast("string"))
    prio = docs.select(
        "doc_id",
        "source",
        "n_chars",
        h.alias("h"),
    ).withColumn(
        "priority",
        F.expr(
            f"cast(n_chars as decimal(38,0)) * {TWO60} div greatest(h + 1, n_chars div 8 + 1)"
        ),
    )
    w = Window.partitionBy("source").orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        prio.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PRIORITY_K)
        .select("source", "rnk", "doc_id", "n_chars", "priority")
    )


def _priority_sql() -> str:
    h = phash_sql("doc_id::VARCHAR")
    return f"""
WITH prio AS (
  SELECT doc_id, source, n_chars,
         (n_chars::HUGEINT * {TWO60})
           // greatest({h} + 1, n_chars // 8 + 1) AS priority
  FROM documents
)
SELECT source, rnk, doc_id, n_chars, priority FROM (
  SELECT source, doc_id, n_chars, priority::BIGINT AS priority,
         row_number() OVER (PARTITION BY source
                            ORDER BY priority DESC, doc_id ASC) AS rnk
  FROM prio
)
WHERE rnk <= {PRIORITY_K}
"""


CURRICULUM_STAGES = 4
CURRICULUM_SHARDS = 8


def mix_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N9 — curriculum staging: order the corpus by a difficulty proxy
    (document length here; any deterministic score column plugs in),
    split into equal-depth training stages with ntile, and assign each
    doc a deterministic hash shard within its stage — the stage/shard
    layout a curriculum-learning run consumes (easy stages first, stable
    shard addressing within each stage; re-running on the same corpus
    reproduces the identical order).

    Scale: the stage boundary is an equal-depth split of the corpus-wide
    (n_chars, doc_id) total order — but `ntile` over an unpartitioned
    window is a SINGLE-TASK sort of the entire corpus (`Exchange
    SinglePartition`; Spark warns "Moving all data to a single
    partition"), the one plan that cannot ship against 100 TB. Instead
    the rank is the two-phase DISTRIBUTED `global_rank` (range partition
    on the total order, within-partition row_number, ≤32-row broadcast
    prefix offsets — functions/ranks.py, proven tie-identical to ntile
    on the replicated sf1 corpus for RFM), and the stage is derived
    arithmetically from (rank, corpus count) via `ntile_from_rank` —
    bit-identical bucket boundaries. Shard choice stays the N6
    shuffle-free hash."""
    from australian_company_etl_spark.functions.ranks import (
        global_rank,
        ntile_from_rank,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    base = docs.select("doc_id", "n_chars")
    # count_name: the corpus total rides out of the rank's own counts
    # aggregate — no second pass over documents for a global count
    ranked = global_rank(
        base, [F.asc("n_chars"), F.asc("doc_id")], "__rnk", count_name="__n"
    )
    shard = phash_spark(F.col("doc_id").cast("string")) % CURRICULUM_SHARDS
    return ranked.select(
        "doc_id",
        F.col("n_chars").alias("difficulty"),
        ntile_from_rank(F.col("__rnk"), F.col("__n"), CURRICULUM_STAGES).alias(
            "stage"
        ),
        shard.cast("int").alias("shard"),
    )


def _curriculum_sql() -> str:
    # NULLS FIRST, explicitly: Spark's ASC places NULLs first while
    # DuckDB's default is NULLS LAST, and a corpus where content-less docs
    # carry NULL n_chars (round-10 random seed 404: null_heavy composed
    # with all_dup's n_chars recompute) shifts every ntile boundary between
    # the engines without it. Spark's ordering is the engine contract.
    return f"""
SELECT doc_id,
       n_chars AS difficulty,
       ntile({CURRICULUM_STAGES}) OVER (ORDER BY n_chars ASC NULLS FIRST, doc_id ASC)::INT AS stage,
       ({phash_sql("doc_id::VARCHAR")} % {CURRICULUM_SHARDS})::INT AS shard
FROM documents
"""


QUERIES = {
    "sample_stratified_hash": sample_stratified_hash,
    "split_train_holdout": split_train_holdout,
    "pack_sequences": pack_sequences,
    "mix_corpus_weighted": mix_corpus_weighted,
    "mix_corpus_temperature": mix_corpus_temperature,
    "chunk_documents": chunk_documents,
    "shard_shuffle_deterministic": shard_shuffle_deterministic,
    "sample_weighted_priority": sample_weighted_priority,
    "mix_curriculum_stages": mix_curriculum_stages,
}

ORACLES = {
    "sample_stratified_hash": SAMPLE_SQL,
    "split_train_holdout": SPLIT_SQL,
    "pack_sequences": PACK_SQL,
    "mix_corpus_weighted": _mix_sql(),
    "mix_corpus_temperature": _mix_temperature_sql(),
    "chunk_documents": _chunk_sql(),
    "shard_shuffle_deterministic": SHARD_SHUFFLE_SQL,
    "sample_weighted_priority": _priority_sql(),
    "mix_curriculum_stages": _curriculum_sql(),
}
