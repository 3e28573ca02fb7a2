"""H15 — distributed BPE vocabulary induction (tokenizer training).

The canonical LLM-pipeline iterative operator: learn byte-pair-encoding
merge rules from the corpus. Training runs on the WORD-FREQUENCY table,
not the raw corpus — the standard formulation (Sennrich et al. 2016;
every production tokenizer trainer does this) — so after one corpus-wide
`groupBy(word)` the iteration cost depends only on vocabulary size, which
is sublinear in corpus bytes. That first aggregation is the only pass
over the 100 TB; everything after runs on a frame of distinct words.

Per merge round, entirely JVM-side:
- adjacent symbol pairs of every word representation, weighted by word
  frequency (`transform` + `explode`, whole-stage codegen);
- the argmax pair with a deterministic tie-break (count desc, then
  lexicographic) — a 1-row collect per round, which is inherent: each BPE
  merge decision is a global sequential dependency;
- the merge applied to every word via a lookbehind/lookahead
  `regexp_replace` over the space-joined symbol string — left-to-right
  non-overlapping, exactly the scan-and-skip-2 semantics of reference BPE
  trainers (proven against an independent Python reimplementation in
  tests/test_operators.py).

The word table is localCheckpoint-ed periodically so lineage stays flat
across rounds (reliable checkpoint() on a cluster). No DuckDB oracle:
the algorithm is iterative with a per-round global argmax — not
SQL-expressible — so the driver records the rows-only check and the
Python-reference test carries the semantics.

Reference parity: the reference tokenizes names with a fixed rule table
(entity_matching.py:42-97); this is the corpus-derived tokenizer a
training pipeline needs instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, IntegerType, StringType, StructField, StructType

from australian_company_etl_spark.functions.textfns import tokens_all_spark
from australian_company_etl_spark.sources.registry import load_tables

BPE_MERGES = 16  # merge rounds to learn
END_OF_WORD = "</w>"  # word-boundary marker symbol

_MERGE_SCHEMA = StructType(
    [
        StructField("rank", IntegerType(), False),
        StructField("left", StringType(), False),
        StructField("right", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def _initial_word_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(space-joined symbol string, frequency) per distinct corpus word."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    wf = (
        docs.select(F.explode(tokens_all_spark(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    # "word" -> "w o r d </w>"; split(w, '') yields the character array
    s = F.concat_ws(
        " ", F.concat(F.split(F.col("w"), ""), F.array(F.lit(END_OF_WORD)))
    )
    return wf.select(s.alias("s"), "cnt")


def _pair_counts(sym: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol strings."""
    pairs = F.expr(
        "transform(slice(split(s, ' '), 1, size(split(s, ' ')) - 1),"
        " (x, i) -> struct(x AS a, element_at(split(s, ' '), i + 2) AS b))"
    )
    return (
        sym.select(F.explode(pairs).alias("p"), "cnt")
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge(sym: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every non-overlapping left-to-right occurrence of (a, b).

    Symbols are runs of [a-z0-9] plus the </w> marker, so embedding them
    in a \\Q...\\E-quoted pattern is safe. The spaces around the pair are
    matched by zero-width lookarounds, so adjacent occurrences that share
    a boundary space both merge ("a b a b" -> "ab ab")."""
    pat = f"(?<= )\\Q{a} {b}\\E(?= )"
    padded = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
    return sym.select(
        F.trim(F.regexp_replace(padded, pat, a + b)).alias("s"), "cnt"
    )


def learn_bpe(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """The merge-rule list [(rank, left, right, merged, pair_count)]."""
    sym = _initial_word_table(spark, sf_dir).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(sym)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:  # degenerate corpus: every word fully merged
            break
        a, b, n = best[0].a, best[0].b, best[0].n
        merges.append((rank, a, b, a + b, n))
        sym = _apply_merge(sym, a, b)
        if rank % 4 == 3:  # keep lineage flat across rounds
            sym = sym.localCheckpoint(eager=True)
    return merges


def text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H15 — learned BPE merge table (rank-ordered)."""
    return spark.createDataFrame(learn_bpe(spark, sf_dir), _MERGE_SCHEMA)


def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H16 — encode the corpus with the learned merges: per document, the
    BPE token count after applying the rank-ordered merge rules, plus the
    compression ratio vs raw character-symbol count. Train→encode
    end-to-end: the same session learns the vocabulary (H15) and applies
    it.

    Scale: encoding runs on the DISTINCT-WORD table (each word's symbol
    count after merges is computed once), then joins back to the per-doc
    word list — per-word work is O(vocabulary · merges), per-doc work is
    one explode + one re-aggregation. The merge rules are literals inside
    the column expressions (a 16-row broadcast in spirit), so the encode
    pass is pure whole-stage-codegen string work — exactly how a
    production tokenizer applies a frozen vocab at corpus scale.
    """
    merges = learn_bpe(spark, sf_dir)
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    doc_words = docs.select(
        "doc_id", F.explode(tokens_all_spark(F.col("text"))).alias("w")
    )
    words = doc_words.groupBy("w").agg(F.count("*").alias("_n")).drop("_n")
    s = F.concat_ws(
        " ", F.concat(F.split(F.col("w"), ""), F.array(F.lit(END_OF_WORD)))
    )
    enc = words.select("w", s.alias("s"))
    raw_syms = F.size(F.split(F.col("s"), " "))
    enc = enc.withColumn("n_raw_syms", raw_syms)
    for _, a, b, _m, _n in merges:
        pat = f"(?<= )\\Q{a} {b}\\E(?= )"
        padded = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
        enc = enc.withColumn("s", F.trim(F.regexp_replace(padded, pat, a + b)))
    enc = enc.select(
        "w", "n_raw_syms", F.size(F.split(F.col("s"), " ")).alias("n_bpe_syms")
    )
    per_doc = (
        doc_words.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_raw_syms").alias("n_char_symbols"),
            F.sum("n_bpe_syms").alias("n_bpe_tokens"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_char_symbols",
        "n_bpe_tokens",
        F.round(
            F.col("n_bpe_tokens").cast("double") / F.col("n_char_symbols"), 6
        ).alias("compression"),
    )


QUERIES = {
    "text_bpe_vocab": text_bpe_vocab,
    "text_bpe_tokenize": text_bpe_tokenize,
}

ORACLES: dict[str, str] = {}
