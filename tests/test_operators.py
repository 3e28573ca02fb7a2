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


def test_norm_prestrips_non_ascii_before_any_boundary_rule(spark):
    """Round-11 unicode_mixed pin: Java's \\b is Unicode-word-aware while
    RE2's is ASCII, and Java's upper() full-case-maps ligatures while
    DuckDB's is simple — so the pipeline strips non-ASCII to spaces BEFORE
    upper() and before any \\b rule. A standalone 'A' next to a combining
    mark must still be removed by the noise rule, and a ligature must die
    in the pre-strip (never expand to FI via Java's upper). All inputs are
    explicit escapes — literals would be normalization-ambiguous."""
    nfd = "Cafe\u0301 A\u030angstrom Pty Ltd"  # NFD: base letters + marks
    assert _norm_one(spark, nfd) == "CAFE NGSTROM PROPRIETARY LIMITED"
    nfc = "Caf\u00e9 \u00c5ngstrom Pty Ltd"  # NFC: precomposed, stripped whole
    assert _norm_one(spark, nfc) == "CAF NGSTROM PROPRIETARY LIMITED"
    # combining-mark stack: base letter survives, standalone A removed
    assert _norm_one(spark, "a\u0301\u0302 combining") == "COMBINING"
    # ligature: pre-stripped, NOT expanded to FI by Java full case mapping
    assert _norm_one(spark, "\ufb01nancial Services") == "NANCIAL SERVICES"
    # the oracle generator agrees on all four (the actual regression)
    import duckdb

    from australian_company_etl_spark.functions.normalize import norm_name_sql

    con = duckdb.connect()
    for s in (nfd, nfc, "a\u0301\u0302 combining", "\ufb01nancial Services"):
        assert con.execute("SELECT " + norm_name_sql("?"), [s]).fetchone()[
            0
        ] == _norm_one(spark, s)


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


def test_best_fuzzy_match_null_scores_rank_last(spark):
    """ADVICE r7 (high): min_by's ordering struct sorts a NULL field FIRST,
    so without the explicit null flag a NULL-scored candidate (null name →
    the normalizers propagate null into the score) wins every left key.
    NULL scores must rank LAST — the window form this replaced and the
    DuckDB oracle both order score DESC NULLS LAST."""
    left = spark.createDataFrame([(1, "ACME LIMITED")], "lk int, lname string")
    right = spark.createDataFrame(
        [(10, None), (11, "ACME LIMITED"), (12, "ZZZZ")], "rk int, rname string"
    )
    out = best_fuzzy_match(left, right, "lk", "lname", "rk", "rname").collect()
    assert len(out) == 1
    assert out[0].rk == 11 and out[0].score == 100
    # all-NULL candidate set: the lowest right key wins (total order intact)
    all_null = spark.createDataFrame(
        [(10, None), (12, None)], "rk int, rname string"
    )
    out2 = best_fuzzy_match(left, all_null, "lk", "lname", "rk", "rname").collect()
    assert len(out2) == 1 and out2[0].rk == 10 and out2[0].score is None


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

    # pinned to the smallest SF: the iterative fixpoint job re-runs the
    # whole minhash pipeline per round and is too slow at larger fixtures
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


def test_ngram_compound_blocking_bounds_skew(spark, sf_dir):
    """F4 — the (first-token, size-bucket) compound key must (a) keep the
    pair set identical to plain first-token blocking and (b) bound the max
    block below the first-token-only max on a size-diverse skewed corpus."""
    from pyspark.sql import functions as F

    from australian_company_etl_spark.plans.dedup import (
        JACCARD_T,
        _doc_shingles,
        _jaccard_spark,
        dedup_ngram_jaccard,
        size_bucket_spark,
    )
    from australian_company_etl_spark.sources.registry import load_tables

    # (a) identical pair set vs the unbucketed reference computation
    got = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    from australian_company_etl_spark.functions.textfns import tokens_all_spark

    blk = docs.select(
        "doc_id", F.element_at(tokens_all_spark(F.col("text")), 1).alias("blk")
    )
    base = _doc_shingles(spark, sf_dir).join(blk, "doc_id")
    a, b = base.alias("a"), base.alias("b")
    jac = _jaccard_spark(F.col("a.sh"), F.col("b.sh"))
    want = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
        .collect()
    }
    assert got == want

    # (b) skewed fixture: every doc starts with "the", sizes span buckets —
    # the compound key must cap the max block well below the token-only max
    rows = [
        (i, "the " + " ".join(f"w{i}x{j}" for j in range(4 + 30 * (i % 4))))
        for i in range(40)
    ]
    fx = spark.createDataFrame(rows, "doc_id int, text string")
    toks = fx.select(
        "doc_id", tokens_all_spark(F.col("text")).alias("t")
    ).select(
        F.element_at("t", 1).alias("blk"),
        size_bucket_spark(F.size("t") - 2).alias("bkt"),  # ≈ 3-gram count
    )
    token_only_max = toks.groupBy("blk").count().agg(F.max("count")).first()[0]
    compound_max = toks.groupBy("blk", "bkt").count().agg(F.max("count")).first()[0]
    assert token_only_max == 40
    assert compound_max < token_only_max


def test_ngram_size_ratio_prune_survives_giant_doc(spark, tmp_path):
    """F4 regression (ADVICE r06, medium) — the size-ratio prune multiplies
    F.size() results, and the session runs ANSI mode (Spark 4 default): with
    int32 math, a doc whose shingle-hash set exceeds 214,748 elements
    (~215k-token document) raised ARITHMETIC_OVERFLOW at runtime and failed
    the whole query. The prune must do bigint math: two near-identical
    220k-token docs must come back as one pair, not an error."""
    from australian_company_etl_spark.plans.dedup import dedup_ngram_jaccard

    n = 220_003  # distinct tokens -> ~220k distinct shingles > 2**31 / 10000
    toks = [f"t{j}" for j in range(n)]
    doc_a = " ".join(toks)
    doc_b = " ".join(toks[:-1] + ["zzz"])  # same first token, same size bucket
    df = spark.createDataFrame(
        [(1, doc_a, "en", "fx", len(doc_a)), (2, doc_b, "en", "fx", len(doc_b))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    pairs = dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    assert [(p.doc_id_a, p.doc_id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard > 0.99


def test_setsim_prefix_recall_is_exact(spark):
    """F10 — the prefix filter must be LOSSLESS: the blocked join's pair set
    equals the unblocked all-pairs ground truth (exact integer Jaccard ≥ τ
    over every doc pair, no candidate generation at all)."""
    from pyspark.sql import functions as F

    from australian_company_etl_spark.functions.textfns import phash_spark
    from australian_company_etl_spark.plans.dedup import (
        SETSIM_DEN,
        SETSIM_NUM,
        _doc_shingle_rows,
        dedup_setsim_prefix,
    )

    # pinned to the smallest SF: ground truth is a quadratic all-pairs join
    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.doc_id_a, r.doc_id_b, r.n_common, r.jaccard)
        for r in dedup_setsim_prefix(spark, sf_dir).collect()
    }
    # same hashed-set universe the operator works over
    base = (
        _doc_shingle_rows(spark, sf_dir)
        .select("doc_id", phash_spark(F.col("s")).alias("h"))
        .dropDuplicates(["doc_id", "h"])
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("sh"))
    )
    a = base.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    want = {
        (r.doc_id_a, r.doc_id_b, r.n_common, r.jaccard)
        for r in a.join(b, F.col("doc_id_a") < F.col("doc_id_b"))
        .withColumn("inter", inter)
        .withColumn("uni", union)
        .filter(SETSIM_DEN * F.col("inter") >= SETSIM_NUM * F.col("uni"))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.col("inter").cast("int").alias("n_common"),
            F.round(F.col("inter") / F.col("uni"), 4).alias("jaccard"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_incremental_dedup_matches_full_pair_set(spark, sf_dir):
    """F12 — the probe-side (batch-only) candidate generation must reach
    the same verdicts as deriving them from the FULL F2 pair set: a new doc
    is a dup iff the full pair list links it to an existing doc or an
    earlier new doc, and best_match/jaccard are the minimum such partner."""
    from australian_company_etl_spark.plans.dedup import (
        NEW_MOD,
        NEW_RESIDUE,
        dedup_incremental,
        dedup_minhash_lsh,
    )

    got = {
        r.doc_id: (r.is_dup, r.best_match, r.jaccard)
        for r in dedup_incremental(spark, sf_dir).collect()
    }
    is_new = lambda d: d % NEW_MOD == NEW_RESIDUE  # noqa: E731
    partners: dict[int, dict[int, float]] = {}
    for p in dedup_minhash_lsh(spark, sf_dir).collect():
        lo, hi = p.doc_id_a, p.doc_id_b
        if is_new(hi):
            partners.setdefault(hi, {})[lo] = p.jaccard
        if is_new(lo) and not is_new(hi):
            partners.setdefault(lo, {})[hi] = p.jaccard
    assert set(got) == {d for d in got if is_new(d)} and len(got) > 0
    for doc_id, (is_dup, best, jac) in got.items():
        if doc_id in partners:
            want_best = min(partners[doc_id])
            assert (is_dup, best, jac) == (True, want_best, partners[doc_id][want_best])
        else:
            assert (is_dup, best, jac) == (False, None, None)
    assert any(v[0] for v in got.values()), "fixture has no incremental dups"


def test_keep_best_selects_max_quality_per_cluster(spark, sf_dir):
    """K3 — exactly one keeper per cluster; the keeper attains the cluster's
    max quality, with the lowest doc_id winning ties."""
    from australian_company_etl_spark.plans.pipeline import curate_keep_best

    rows = curate_keep_best(spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert any(len(m) > 1 for m in by_cluster.values()), "no multi-doc clusters"
    for members in by_cluster.values():
        keepers = [r for r in members if r.is_keeper]
        assert len(keepers) == 1
        want = min(members, key=lambda r: (-r.quality, r.doc_id))
        assert keepers[0].doc_id == want.doc_id
        assert all(r.cluster_size == len(members) for r in members)


def test_results_invariant_under_shuffle_fanout(spark):
    """Partition-layout independence, the determinism claim behind every
    'reproducible across cluster sizes' docstring: representative
    order-sensitive queries (iterative k-means, window packing, hash
    shard addressing, minhash pairs) must produce IDENTICAL rows when the
    shuffle fan-out changes 32 → 7."""
    from australian_company_etl_spark.plans.dedup import dedup_minhash_lsh
    from australian_company_etl_spark.plans.sampling import (
        pack_sequences,
        shard_shuffle_deterministic,
    )
    from australian_company_etl_spark.plans.similarity import cluster_kmeans_embed

    sf_dir = "/root/testdata/sf0.001"
    targets = {
        "kmeans": cluster_kmeans_embed,
        "pack": pack_sequences,
        "shard": shard_shuffle_deterministic,
        "minhash": dedup_minhash_lsh,
    }
    base = {k: {tuple(r) for r in fn(spark, sf_dir).collect()} for k, fn in targets.items()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        for k, fn in targets.items():
            got = {tuple(r) for r in fn(spark, sf_dir).collect()}
            assert got == base[k], f"{k} changed under a different shuffle fan-out"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_cluster_cc_checkpointed_equals_default(spark):
    """F6 — forcing a lineage checkpoint every round must not change the
    fixpoint labels (the truncation is pure plan surgery)."""
    from australian_company_etl_spark.plans.dedup import dedup_cluster_cc

    sf_dir = "/root/testdata/sf0.001"
    want = {(r.doc_id, r.cluster_id, r.cluster_size) for r in dedup_cluster_cc(spark, sf_dir).collect()}
    got = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in dedup_cluster_cc(spark, sf_dir, checkpoint_every=1).collect()
    }
    assert got == want and len(got) > 0


def test_hll_daily_merge_equals_global_sketch(spark, sf_dir):
    """M6 — merging per-day register partials (elementwise max) must give
    EXACTLY the all-data sketch's estimate: register max is associative, so
    merge(partials) == whole, the property that lets raw data be archived."""
    from australian_company_etl_spark.plans.sketches import (
        sketch_hll_daily_merge,
        sketch_hll_distinct,
    )

    merged = {
        r.event_type: r.hll_estimate for r in sketch_hll_daily_merge(spark, sf_dir).collect()
    }
    whole = {
        r.event_type: r.hll_estimate for r in sketch_hll_distinct(spark, sf_dir).collect()
    }
    assert merged == whole and len(merged) > 0


def test_triangle_count_matches_python_enumeration(spark, sf_dir):
    """F13 — per-doc triangle counts and degrees must equal an independent
    Python enumeration over the same F2 pair list."""
    from itertools import combinations

    from australian_company_etl_spark.plans.dedup import (
        dedup_minhash_lsh,
        graph_triangle_count,
    )

    edges = {
        (r.doc_id_a, r.doc_id_b)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_of = dict.fromkeys(adj, 0)
    for v, nbrs in adj.items():
        for x, y in combinations(sorted(nbrs), 2):
            if (x, y) in edges or (y, x) in edges:
                tri_of[v] += 1
    got = {r.doc_id: (r.degree, r.n_triangles) for r in graph_triangle_count(spark, sf_dir).collect()}
    want = {v: (len(adj[v]), tri_of[v]) for v in adj}
    assert got == want and len(got) > 0


def test_contamination_automaton_matches_expression_path(spark, sf_dir):
    """H8 — the Aho-Corasick mapInPandas path must produce exactly the
    expression path's rows on the standard blocklist."""
    from australian_company_etl_spark.plans.text import text_contamination

    exact = {tuple(r) for r in text_contamination(spark, sf_dir, use_automaton=False).collect()}
    auto = {tuple(r) for r in text_contamination(spark, sf_dir, use_automaton=True).collect()}
    assert auto == exact and len(auto) > 0


def test_contamination_automaton_1k_phrases(spark, sf_dir):
    """H8 scale path — a 1000-phrase blocklist runs as ONE automaton pass
    over a single corpus scan (no per-phrase scan fan-out), and sampled
    phrase counts agree with direct substring counts."""
    from pyspark.sql import functions as F

    from australian_company_etl_spark.operators.contamination import (
        AhoCorasick,
        contamination_report,
    )
    from australian_company_etl_spark.sources.registry import load_tables

    # unit sanity: overlapping + nested patterns
    ac = AhoCorasick(["he", "she", "his", "hers", "banana"])
    assert ac.patterns_present("ushers") == {0, 1, 3}
    assert ac.patterns_present("bananana") == {4}
    assert ac.patterns_present("") == set()

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    vocab = [r.w for r in docs.select(F.explode(F.split("text", " ")).alias("w"))
             .groupBy("w").count().orderBy(F.desc("count")).limit(40).collect()]
    phrases = sorted({f"{a} {b}" for a in vocab for b in vocab})[:1000]
    pdf = spark.createDataFrame([(p,) for p in phrases], "phrase string")
    rep = contamination_report(docs, pdf, phrases, use_automaton=True)
    plan = rep._jdf.queryExecution().sparkPlan().toString()
    assert "MapInPandas" in plan
    assert plan.count("Scan parquet") <= 1  # one corpus scan, no phrase fan-out
    rows = {r.phrase: (r.n_docs, r.first_doc) for r in rep.collect()}
    assert len(rows) == len(phrases)
    # spot-check 5 phrases against direct substring counts
    for p in phrases[:: max(1, len(phrases) // 5)][:5]:
        n = docs.filter(F.col("text").contains(p)).count()
        first = docs.filter(F.col("text").contains(p)).agg(F.min("doc_id")).first()[0]
        assert rows[p] == (n, first)


def test_repetition_ratio_bounds(spark, sf_dir):
    from australian_company_etl_spark.plans.text import text_repetition_ratio

    rows = text_repetition_ratio(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.rep_ratio <= 1.0
        assert r.n_distinct <= r.n_shingles


def test_unigram_logprob_semantics(spark, sf_dir):
    from australian_company_etl_spark.plans.text import text_unigram_logprob

    rows = text_unigram_logprob(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        if r.n_tokens > 0:
            # ln of a probability < 1 is strictly negative
            assert r.avg_logprob < 0
            # unigram probs can't be below 1/total_tokens
            assert r.avg_logprob > -20
        else:
            assert r.avg_logprob is None


def test_bloom_membership_no_false_negatives(spark, sf_dir):
    from australian_company_etl_spark.plans.sketches import sketch_bloom_membership

    rows = sketch_bloom_membership(spark, sf_dir).collect()
    assert len(rows) > 0
    # a Bloom filter may report false positives but NEVER false negatives
    for r in rows:
        if r.is_member:
            assert r.bloom_maybe
    # the probe covers the full users x types cross product
    n_users = len({r.user_id for r in rows})
    n_types = len({r.event_type for r in rows})
    assert len(rows) == n_users * n_types


def test_chunk_documents_overlap_and_sizes(spark, sf_dir):
    from australian_company_etl_spark.plans.sampling import (
        CHUNK_C,
        CHUNK_S,
        chunk_documents,
    )

    rows = chunk_documents(spark, sf_dir).collect()
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


def test_scd2_intervals_chain_per_user(spark, sf_dir):
    from australian_company_etl_spark.plans.streaming_batch import events_scd2_history

    rows = events_scd2_history(spark, sf_dir).collect()
    assert len(rows) > 0
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from_us)
        # exactly one open (current) interval per user, and it is the last
        currents = [r for r in ivs if r.is_current]
        assert len(currents) == 1 and ivs[-1].is_current
        for a, b in zip(ivs, ivs[1:]):
            # intervals chain with no gap or overlap, and states actually change
            assert a.valid_to_us == b.valid_from_us
            assert a.state != b.state


def test_funnel_conversion_semantics(spark, sf_dir):
    from australian_company_etl_spark.plans.streaming_batch import events_funnel_steps

    rows = events_funnel_steps(spark, sf_dir).collect()
    assert len(rows) > 0
    assert any(r.converted for r in rows)
    for r in rows:
        assert r.converted == (r.purchase_us is not None)
        if r.converted:
            assert r.purchase_us >= r.signup_us
            assert r.secs_to_convert >= 0


def test_gopher_keep_is_conjunction_and_varies(spark, sf_dir):
    from australian_company_etl_spark.plans.text import text_gopher_filters

    rows = text_gopher_filters(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.keep == (r.r_words and r.r_meanlen and r.r_alpha and r.r_symbol and r.r_stop)
    kept = sum(r.keep for r in rows)
    # the filter must actually separate the corpus, not pass/fail everything
    assert 0 < kept < len(rows)


def test_shard_shuffle_addresses_dense_and_unique(spark, sf_dir):
    from australian_company_etl_spark.plans.sampling import (
        NUM_SHARDS,
        shard_shuffle_deterministic,
    )

    rows = shard_shuffle_deterministic(spark, sf_dir).collect()
    assert len(rows) > 0
    addr = {(r.shard_id, r.pos) for r in rows}
    assert len(addr) == len(rows), "(shard, pos) addresses must be unique"
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r.shard_id < NUM_SHARDS
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    for shard, ps in by_shard.items():
        # positions are dense from 1 — a reader can stream a shard by rank
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_semantic_dedup_keeps_one_per_cluster(spark, sf_dir):
    from australian_company_etl_spark.plans.similarity import dedup_semantic_kmeans

    rows = dedup_semantic_kmeans(spark, sf_dir).collect()
    assert len(rows) > 0
    keep_by_cluster: dict = {}
    for r in rows:
        keep_by_cluster.setdefault(r.cluster_id, []).append((r.vec_id, r.keep))
    for cluster, members in keep_by_cluster.items():
        keepers = [v for v, k in members if k]
        assert keepers, f"cluster {cluster} lost every member"
        # keep-lowest-id policy: the smallest vec_id in a cluster can never
        # be dropped (it is never the 'b' side of a qualifying pair)
        assert min(v for v, _ in members) in keepers


def test_cms_never_underestimates(spark, sf_dir):
    from australian_company_etl_spark.plans.sketches import sketch_cms_heavy_hitters

    rows = sketch_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # the count-min guarantee: collisions only ever ADD
        assert r.n_est >= r.n_exact


def test_retention_week0_counts_whole_cohort(spark, sf_dir):
    from australian_company_etl_spark.plans.streaming_batch import (
        events_retention_cohorts,
    )

    rows = events_retention_cohorts(spark, sf_dir).collect()
    assert rows
    by_cohort: dict[int, dict[int, int]] = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_users
    for offsets in by_cohort.values():
        # every cohort member is active in their own first week, so the
        # offset-0 cell is the cohort size and bounds every later cell
        assert 0 in offsets
        assert offsets[0] == max(offsets.values())


def test_outlier_flag_matches_float_zscore(spark, sf_dir):
    import statistics

    from australian_company_etl_spark.plans.streaming_batch import (
        events_value_outliers,
    )

    rows = events_value_outliers(spark, sf_dir).collect()
    vals: dict[str, list[int]] = {}
    for r in rows:
        vals.setdefault(r.event_type, []).append(r.v_centi)
    for r in rows:
        vs = vals[r.event_type]
        mu = statistics.fmean(vs)
        sigma = statistics.pstdev(vs)
        z = abs(r.v_centi - mu) / sigma if sigma else 0.0
        # away from the boundary the exact-integer flag must agree with the
        # float z-score; within 1e-6 of |z|=3 the float path itself is moot
        if abs(z - 3.0) > 1e-6:
            assert r.is_outlier == (z > 3.0), (r.event_type, r.v_centi, z)


def test_tfidf_topterms_rank_and_salience(spark, sf_dir):
    from australian_company_etl_spark.plans.text import text_tfidf_topterms

    rows = text_tfidf_topterms(spark, sf_dir).collect()
    assert rows
    per_doc: dict[str, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in per_doc.values():
        assert len(doc_rows) <= 5
        doc_rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        # ranking is by the exact integer surrogate, ties broken by token
        for a, b in zip(doc_rows, doc_rows[1:]):
            assert (a.score_micro, b.tok) >= (b.score_micro, a.tok)
            # surrogate agrees with float tf-idf ordering (ln monotone in N/df)
            assert a.tf / a.df_docs >= b.tf / b.df_docs or a.score_micro > b.score_micro


def test_hll_registers_and_error_bound(spark, sf_dir):
    from australian_company_etl_spark.plans.sketches import sketch_hll_distinct

    rows = sketch_hll_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_present <= 64
        # m=64 gives ~13% standard error; 3 sigma as the invariant
        rel = abs(r.hll_estimate - r.n_distinct_exact) / r.n_distinct_exact
        assert rel < 0.4, (r.event_type, r.hll_estimate, r.n_distinct_exact)


def test_priority_sample_is_weight_biased_and_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from australian_company_etl_spark.plans.sampling import (
        PRIORITY_K,
        sample_weighted_priority,
    )
    from australian_company_etl_spark.sources.registry import load_tables

    out = sample_weighted_priority(spark, sf_dir)
    rows = out.collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    n_per_src = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, srows in per_src.items():
        assert len(srows) == min(PRIORITY_K, n_per_src[src])
        ranks = sorted(r.rnk for r in srows)
        assert ranks == list(range(1, len(srows) + 1))
    # weight-proportional: sampled docs are longer than the corpus average
    mean_sample = sum(r.n_chars for r in rows) / len(rows)
    mean_corpus = docs.agg(F.avg("n_chars")).first()[0]
    assert mean_sample > mean_corpus
    # deterministic: a second build yields the identical sample
    again = sorted((r.source, r.rnk, r.doc_id) for r in sample_weighted_priority(spark, sf_dir).collect())
    assert again == sorted((r.source, r.rnk, r.doc_id) for r in rows)


def test_pagerank_matches_independent_python_reimplementation(spark, sf_dir):
    """Exact fixed-point PageRank must equal a from-scratch driver-side
    reimplementation over the same edge list — catches any silent
    integer/float divergence in the distributed update."""
    from australian_company_etl_spark.plans.dedup import (
        PR_DAMP,
        PR_ITERS,
        PR_ONE,
        dedup_minhash_lsh,
        rank_neardup_pagerank,
    )

    pairs = [(r.doc_id_a, r.doc_id_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()]
    edges = pairs + [(b, a) for a, b in pairs]
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: PR_ONE for n in deg}
    for _ in range(PR_ITERS):
        acc: dict[int, int] = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + pr[s] // deg[s]
        pr = {n: (PR_ONE - PR_DAMP) + (PR_DAMP * s_) // PR_ONE for n, s_ in acc.items()}
    got = {r.doc_id: r.pr_ppm for r in rank_neardup_pagerank(spark, sf_dir).collect()}
    assert got == pr
    assert all(v >= PR_ONE - PR_DAMP for v in got.values())


def test_resample_ffill_grid_is_dense_and_carries_values(spark, sf_dir):
    from australian_company_etl_spark.plans.temporal import events_resample_ffill

    rows = events_resample_ffill(spark, sf_dir).collect()
    assert rows
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    for user_rows in per_user.values():
        user_rows.sort(key=lambda r: r.hour_at)
        # dense hourly grid: consecutive rows are exactly 1h apart
        from datetime import datetime, timedelta

        ts = [datetime.strptime(r.hour_at, "%Y-%m-%d %H:%M:%S") for r in user_rows]
        assert all(b - a == timedelta(hours=1) for a, b in zip(ts, ts[1:]))
        # first row is an observed hour, so the fill chain starts non-null
        assert user_rows[0].n_events > 0
        assert user_rows[0].v_ffill_centi is not None
        # gap rows (n_events = 0) carry the previous row's value verbatim
        for prev, cur in zip(user_rows, user_rows[1:]):
            if cur.n_events == 0:
                assert cur.v_ffill_centi == prev.v_ffill_centi


def test_drift_psi_terms_nonnegative_and_counts_complete(spark, sf_dir):
    from australian_company_etl_spark.plans.quality import quality_drift_psi

    rows = quality_drift_psi(spark, sf_dir).collect()
    assert rows
    # (p−q)·ln(p/q) has matching signs in both factors — every term ≥ 0,
    # so PSI can never be deflated by a compensating negative bin
    assert all(r.psi_term >= 0.0 for r in rows)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_ref + r.n_cur for r in rows) == n_docs


def test_cdc_snapshot_latest_row_and_tombstones(spark, sf_dir):
    from australian_company_etl_spark.plans.streaming_batch import (
        CDC_DELETE_TYPE,
        events_cdc_snapshot,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    last = {}
    for e in ev:
        key = (e.ts, e.event_id)
        if e.user_id not in last or key > (last[e.user_id].ts, last[e.user_id].event_id):
            last[e.user_id] = e
    expect = {
        u: e for u, e in last.items() if e.event_type != CDC_DELETE_TYPE
    }
    got = {r.user_id: r for r in events_cdc_snapshot(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for u, r in got.items():
        assert r.last_event_id == expect[u].event_id
        assert r.last_event_type == expect[u].event_type
        assert r.last_value == expect[u].value


def test_watermark_lag_audit_bounds(spark, sf_dir):
    from australian_company_etl_spark.plans.streaming_batch import (
        events_watermark_lag_audit,
    )

    rows = events_watermark_lag_audit(spark, sf_dir).collect()
    assert rows
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in rows) == total
    for r in rows:
        # lateness is clamped at zero and p99 can't exceed the max
        assert 0 <= r.n_late <= r.n_events
        assert r.max_late_s >= 0
        assert r.p99_late_s <= r.max_late_s + 1  # p99 interpolates sub-second floor


def test_theta_setops_estimates_and_set_identities(spark, sf_dir):
    from australian_company_etl_spark.plans.sketches import sketch_theta_setops

    rows = sketch_theta_setops(spark, sf_dir).collect()
    assert rows  # every unordered type pair present
    n_types = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    assert len(rows) == n_types * (n_types - 1) // 2
    for r in rows:
        # set identities on the exact side
        assert r.n_exact_inter <= r.n_exact_union
        # sketch estimates land within a generous KMV error envelope (k=64
        # ⇒ rse ≈ 1/√62 ≈ 13%; allow 5σ for the intersection's smaller
        # effective k, and exactness when the sketch never filled)
        assert abs(r.theta_union_est - r.n_exact_union) <= max(
            5, 0.65 * r.n_exact_union
        )
        assert abs(r.theta_inter_est - r.n_exact_inter) <= max(
            5, 0.65 * max(r.n_exact_union, 1)
        )


def test_bpe_vocab_matches_python_reference(spark, sf_dir):
    """The distributed BPE trainer must produce the exact merge sequence of
    an independent single-machine reimplementation (Sennrich-style:
    word-frequency table, global argmax pair with (count desc, pair asc)
    tie-break, left-to-right non-overlapping merge)."""
    import re
    from collections import Counter

    from australian_company_etl_spark.plans.bpe import (
        BPE_MERGES,
        END_OF_WORD,
        text_bpe_vocab,
    )

    wf: Counter = Counter()
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect():
        for w in re.split(r"[^a-z0-9]+", r.text.strip().lower()):
            if w:
                wf[w] += 1
    reps = {w: tuple(w) + (END_OF_WORD,) for w in wf}
    expect = []
    for rank in range(BPE_MERGES):
        pc: Counter = Counter()
        for w, syms in reps.items():
            c = wf[w]
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        expect.append((rank, a, b, a + b, n))
        merged_reps = {}
        for w, syms in reps.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged_reps[w] = tuple(out)
        reps = merged_reps
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in text_bpe_vocab(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == expect


def test_bpe_tokenize_matches_python_reference(spark, sf_dir):
    """Encoding with the learned merges must equal an independent Python
    encode: per doc, apply the merge rules rank-order to every word and
    count the resulting symbols."""
    import re

    from australian_company_etl_spark.plans.bpe import (
        END_OF_WORD,
        learn_bpe,
        text_bpe_tokenize,
    )

    merges = learn_bpe(spark, sf_dir)

    def encode(word: str) -> int:
        syms = list(word) + [END_OF_WORD]
        for _, a, b, _m, _n in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    enc_cache: dict[str, int] = {}
    expect = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ):
        raw = bpe = 0
        for w in re.split(r"[^a-z0-9]+", r.text.strip().lower()):
            if not w:
                continue
            raw += len(w) + 1
            if w not in enc_cache:
                enc_cache[w] = encode(w)
            bpe += enc_cache[w]
        expect[r.doc_id] = (raw, bpe)
    got = {
        r.doc_id: (r.n_char_symbols, r.n_bpe_tokens)
        for r in text_bpe_tokenize(spark, sf_dir).collect()
    }
    assert got == expect


def test_top_eigenvector_matches_python_reference(spark, sf_dir):
    """The distributed power iteration must be integer-exact: replicate
    the quantize → matvec → isqrt-renormalize loop in plain Python and
    demand bit-identical micro components."""
    import math

    from australian_company_etl_spark.plans.similarity import (
        EMB_DIM,
        POWER_ITERS,
        _PI_SCALE,
        embed_top_eigenvector,
    )

    embs = [
        [round(x * _PI_SCALE) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .collect()
    ]
    v = [_PI_SCALE] + [0] * (EMB_DIM - 1)
    for _ in range(POWER_ITERS):
        w = [0] * EMB_DIM
        for e in embs:
            s = sum(a * b for a, b in zip(e, v))
            # Spark's `div` truncates toward zero; Python's // floors
            sd = s // _PI_SCALE if s >= 0 else -((-s) // _PI_SCALE)
            for j in range(EMB_DIM):
                w[j] += e[j] * sd
        norm = math.isqrt(sum(x * x for x in w))
        if norm == 0:
            break
        v = [
            (2 * x * _PI_SCALE + (norm if x >= 0 else -norm)) // (2 * norm)
            for x in w
        ]
    got = {r.dim: r.v_micro for r in embed_top_eigenvector(spark, sf_dir).collect()}
    assert got == {j: v[j] for j in range(EMB_DIM)}
    # and it is a (near-)unit vector in micro units
    assert abs(sum(x * x for x in v) ** 0.5 - _PI_SCALE) < 100


def test_multitable_lsh_recall_dominates_single_table(spark, sf_dir):
    """Multi-table OR'd LSH: table 0 reuses G2's planes, so every query's
    mt3 candidate set CONTAINS its single-table candidate set — per-query
    recall can never decrease (the structural guarantee), and on this
    corpus the two extra tables must find at least one extra true
    neighbor somewhere (the measured uplift the report exists to show —
    needs sf0.01: at sf0.001 the 10-query probe set is too small for a
    guaranteed strict gain)."""
    import os

    from australian_company_etl_spark.plans.similarity import ann_recall_report

    uplift_dir = "/root/testdata/sf0.01"
    data_dir = uplift_dir if os.path.exists(uplift_dir) else sf_dir
    rep = ann_recall_report(spark, data_dir).collect()
    by_method = {}
    for r in rep:
        by_method.setdefault(r.method, {})[r.q_id] = r.n_hit
    lsh, mt3 = by_method["lsh"], by_method["lsh_mt3"]
    assert set(lsh) == set(mt3)
    for q_id in lsh:
        assert mt3[q_id] >= lsh[q_id], f"q{q_id}: mt3 lost a neighbor table 0 found"
    if data_dir == uplift_dir:
        assert sum(mt3.values()) > sum(lsh.values()), "extra tables found nothing"


def test_null_empty_counts_zero_not_null_on_empty_table(spark):
    """Review finding: sum(when(...)) over ZERO rows is NULL — an empty
    landed batch reported n_null=NULL, falsifying any `n_null == 0` check
    where the psql reference prints 0."""
    from australian_company_etl_spark.operators.quality import null_empty_counts

    empty = spark.createDataFrame([], "c string")
    row = null_empty_counts([("t0", empty, "c")]).collect()[0]
    assert (row.n_null, row.n_empty) == (0, 0)


def test_best_fuzzy_match_aggregates_without_window_shuffle(spark):
    """Review finding: the window form shuffled the entire N×M scored cross
    product through Exchange hashpartitioning before keeping one row per
    key; the min_by aggregate partial-combines map-side. Pin the plan shape
    (no row_number window) and the extractOne tie semantics (best score,
    then lowest right key)."""
    from australian_company_etl_spark.operators.matching import best_fuzzy_match

    left = spark.createDataFrame(
        [(1, "acme pty"), (2, "widget co")], "lk bigint, lname string"
    )
    right = spark.createDataFrame(
        [(10, "acme pty"), (11, "acme pty"), (12, "widget co ltd")],
        "rk bigint, rname string",
    )
    out = best_fuzzy_match(left, right, "lk", "lname", "rk", "rname")
    rows = {r.lk: (r.rk, r.score) for r in out.collect()}
    assert rows[1][0] == 10  # perfect-score tie (10 vs 11) breaks LOW
    assert rows[2][0] == 12
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan and "min_by" in plan
