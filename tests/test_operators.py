"""Unit semantics for normalization / matching / text primitives —
executable versions of the reference's documented behaviors
(entity_matching.py:42-97, 142-170, 405-425; extract_abr.py:57-66)."""

from __future__ import annotations

from pyspark.sql import functions as F

from australian_company_etl_spark.functions.normalize import norm_name_spark
from australian_company_etl_spark.functions.textfns import (
    jaccard_pct_spark,
    lev_ratio_spark,
    tokens_spark,
)
from australian_company_etl_spark.operators.matching import best_fuzzy_match, first_wins


def _norm_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "name string")
    return df.select(norm_name_spark(F.col("name")).alias("n")).first().n


def test_norm_abbrev_expansion(spark):
    assert _norm_one(spark, "Acme Pty Ltd") == "ACME PROPRIETARY LIMITED"
    assert _norm_one(spark, "acme PTY. LTD.") == "ACME PROPRIETARY LIMITED"
    assert _norm_one(spark, "Widget Co") == "WIDGET COMPANY"


def test_norm_entities_and_noise(spark):
    assert _norm_one(spark, "Bob &amp; Sons") == "BOB AND SONS"
    assert _norm_one(spark, "Bob & Co") == "BOB AND COMPANY"
    assert _norm_one(spark, "The Widget Shop (Sydney)") == "WIDGET SHOP"
    assert _norm_one(spark, "  spaced   out  name ") == "SPACED OUT NAME"


def test_lev_ratio_bounds(spark):
    df = spark.createDataFrame(
        [("ACME", "ACME"), ("ACME", "ACMES"), ("ABCD", "WXYZ"), ("", "")],
        "a string, b string",
    )
    rows = df.select("a", "b", lev_ratio_spark(F.col("a"), F.col("b")).alias("r")).collect()
    by = {(r.a, r.b): r.r for r in rows}
    assert by[("ACME", "ACME")] == 100
    assert by[("", "")] == 100
    assert by[("ABCD", "WXYZ")] == 0
    assert 0 < by[("ACME", "ACMES")] < 100


def test_jaccard_pct(spark):
    df = spark.createDataFrame([("red blue green", "blue green yellow")], "a string, b string")
    r = df.select(
        jaccard_pct_spark(tokens_spark(F.col("a")), tokens_spark(F.col("b"))).alias("j")
    ).first()
    assert r.j == 50  # |{blue,green}| / |{red,blue,green,yellow}|


def test_first_wins_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b", 20), (1, "a", 10), (2, "c", 30)], "k int, v string, o int"
    )
    out = first_wins(df, ["k"], [F.asc("o")]).collect()
    by = {r.k: r.v for r in out}
    assert by == {1: "a", 2: "c"}


def test_best_fuzzy_match_extractone(spark):
    left = spark.createDataFrame([(1, "ACME LIMITED")], "lk int, lname string")
    right = spark.createDataFrame(
        [(10, "ACME LIMITED"), (11, "ACME LIMITER"), (12, "ZZZZ")], "rk int, rname string"
    )
    out = best_fuzzy_match(left, right, "lk", "lname", "rk", "rname").collect()
    assert len(out) == 1
    assert out[0].rk == 10 and out[0].score == 100


def test_multi_scorer_token_sort_beats_ratio(spark):
    """entity_matching.py:405-418 — word-swapped names score 100 under
    token_sort/token_set while plain ratio stays low; subset names (extra
    tokens on one side) score 100 under token_set only."""
    from australian_company_etl_spark.functions.textfns import (
        token_array_spark,
        token_set_ratio_spark,
        token_set_strings_spark,
        token_sort_str_spark,
    )

    df = spark.createDataFrame(
        [("LIMITED ACME", "ACME LIMITED"), ("ACME", "ACME LIMITED COMPANY")],
        "a string, b string",
    )
    t0, t1, t2 = token_set_strings_spark(
        token_array_spark(F.col("a")), token_array_spark(F.col("b"))
    )
    rows = df.select(
        "a",
        lev_ratio_spark(F.col("a"), F.col("b")).alias("ratio"),
        lev_ratio_spark(
            token_sort_str_spark(F.col("a")), token_sort_str_spark(F.col("b"))
        ).alias("tsort"),
        token_set_ratio_spark(t0, t1, t2).alias("tset"),
    ).collect()
    by = {r.a: r for r in rows}
    swapped = by["LIMITED ACME"]
    assert swapped.tsort == 100 and swapped.tset == 100 and swapped.ratio < 100
    subset = by["ACME"]
    assert subset.tset == 100 and subset.tsort < 100


def test_table_health_matches_fs_ground_truth(spark, sf_dir):
    """C5 — file metrics must equal os.stat on the actual parquet files,
    row counts must equal a direct count, and skew is >= 100 by definition
    (max partition is at least the average)."""
    import os

    from australian_company_etl_spark.plans.quality import (
        COUNT_TABLES,
        quality_table_health,
    )
    from australian_company_etl_spark.sources.registry import load_tables, table_path

    rows = quality_table_health(spark, sf_dir).collect()
    by = {(r.table_name, r.metric): r.value for r in rows}
    t = load_tables(spark, sf_dir, COUNT_TABLES)
    for name in COUNT_TABLES:
        size = os.stat(table_path(sf_dir, name)).st_size
        assert by[(name, "n_files")] == 1  # sandbox: one file per table
        assert by[(name, "total_bytes")] == size
        assert by[(name, "min_file_bytes")] == size
        assert by[(name, "max_file_bytes")] == size
        assert by[(name, "small_files")] == 1
        assert by[(name, "n_rows")] == t[name].count()
        assert by[(name, "max_partition_rows")] <= by[(name, "n_rows")]
        assert by[(name, "skew_pct")] >= 100


def test_cluster_cc_merges_transitively(spark):
    """A chain a-b, b-c must collapse to one cluster labeled min(a,b,c),
    and cluster sizes must equal the label group counts."""
    from australian_company_etl_spark.plans.dedup import dedup_cluster_cc

    sf_dir = "/root/testdata/sf0.001"
    out = dedup_cluster_cc(spark, sf_dir)
    rows = out.collect()
    label_of = {r.doc_id: r.cluster_id for r in rows}
    # every cluster is labeled by its own minimum member
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert min(members) == cid
    # sizes consistent
    for r in rows:
        assert r.cluster_size == len(by_cluster[r.cluster_id])
    # transitivity over the generating edges: both endpoints share a label
    from australian_company_etl_spark.plans.dedup import dedup_minhash_lsh

    for p in dedup_minhash_lsh(spark, sf_dir).collect():
        assert label_of[p.doc_id_a] == label_of[p.doc_id_b]


def test_repetition_ratio_bounds(spark):
    from australian_company_etl_spark.plans.text import text_repetition_ratio

    rows = text_repetition_ratio(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.rep_ratio <= 1.0
        assert r.n_distinct <= r.n_shingles


def test_unigram_logprob_semantics(spark):
    from australian_company_etl_spark.plans.text import text_unigram_logprob

    rows = text_unigram_logprob(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        if r.n_tokens > 0:
            # ln of a probability < 1 is strictly negative
            assert r.avg_logprob < 0
            # unigram probs can't be below 1/total_tokens
            assert r.avg_logprob > -20
        else:
            assert r.avg_logprob is None


def test_bloom_membership_no_false_negatives(spark):
    from australian_company_etl_spark.plans.sketches import sketch_bloom_membership

    rows = sketch_bloom_membership(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    # a Bloom filter may report false positives but NEVER false negatives
    for r in rows:
        if r.is_member:
            assert r.bloom_maybe
    # the probe covers the full users x types cross product
    n_users = len({r.user_id for r in rows})
    n_types = len({r.event_type for r in rows})
    assert len(rows) == n_users * n_types


def test_chunk_documents_overlap_and_sizes(spark):
    from australian_company_etl_spark.plans.sampling import (
        CHUNK_C,
        CHUNK_S,
        chunk_documents,
    )

    rows = chunk_documents(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    overlap = CHUNK_C - CHUNK_S
    for doc_id, chunks in by_doc.items():
        # chunk ids are dense from 0
        assert sorted(chunks) == list(range(len(chunks)))
        for cid, r in chunks.items():
            toks = r.chunk_text.split(" ")
            # declared size matches the text
            assert len(toks) == r.n_chunk_tokens
            assert r.n_chunk_tokens <= CHUNK_C
            # consecutive full chunks share exactly `overlap` tokens
            nxt = chunks.get(cid + 1)
            if nxt is not None and r.n_chunk_tokens == CHUNK_C:
                assert toks[-overlap:] == nxt.chunk_text.split(" ")[:overlap]
