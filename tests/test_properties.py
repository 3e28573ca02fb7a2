"""Property-based invariants (hypothesis) for the dual-dialect primitives.

Spark actions are expensive, so each property generates a BATCH of examples
and checks them in one DataFrame action instead of one action per example.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from australian_company_etl_spark.functions.normalize import norm_name_spark
from australian_company_etl_spark.functions.textfns import (
    jaccard_pct_spark,
    lev_ratio_spark,
    tokens_spark,
)

NAME_ALPHABET = string.ascii_letters + string.digits + " &+().-'/"
names = st.text(alphabet=NAME_ALPHABET, min_size=0, max_size=40)


@settings(max_examples=5, deadline=None)
@given(st.lists(names, min_size=1, max_size=25))
def test_normalization_is_idempotent(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], "name string")
    out = df.select(
        norm_name_spark(F.col("name")).alias("once"),
    ).select(
        "once", norm_name_spark(F.col("once")).alias("twice")
    )
    bad = out.filter(F.col("once") != F.col("twice")).collect()
    assert not bad, f"normalization not idempotent for: {bad[:3]}"


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(names, names), min_size=1, max_size=25))
def test_lev_ratio_bounds_and_symmetry(spark, batch):
    df = spark.createDataFrame(list(batch), "a string, b string")
    out = df.select(
        lev_ratio_spark(F.col("a"), F.col("b")).alias("ab"),
        lev_ratio_spark(F.col("b"), F.col("a")).alias("ba"),
        (F.col("a") == F.col("b")).alias("eq"),
    ).collect()
    for r in out:
        assert 0 <= r.ab <= 100
        assert r.ab == r.ba
        if r.eq:
            assert r.ab == 100


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(names, names), min_size=1, max_size=25))
def test_jaccard_bounds_and_identity(spark, batch):
    df = spark.createDataFrame(list(batch), "a string, b string")
    ta, tb = tokens_spark(F.col("a")), tokens_spark(F.col("b"))
    out = df.select(
        jaccard_pct_spark(ta, tb).alias("j"),
        jaccard_pct_spark(tb, ta).alias("j_sym"),
        (ta == tb).alias("same_toks"),
        (F.size(ta) == 0).alias("empty_a"),
        (F.size(tb) == 0).alias("empty_b"),
    ).collect()
    for r in out:
        assert 0 <= r.j <= 100
        assert r.j == r.j_sym
        if r.same_toks and not r.empty_a:
            assert r.j == 100
        if r.empty_a and r.empty_b:
            assert r.j == 0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_interleave_is_bijective(spark, batch):
    """L11 — the Morton interleave must be invertible: deinterleaving the
    even/odd bits recovers exactly (a, b), for any 16-bit pair."""
    from australian_company_etl_spark.plans.temporal import _interleave_expr

    df = spark.createDataFrame(batch, "a bigint, b bigint")
    z = df.select("a", "b", F.expr(_interleave_expr("a", "b", spark_dialect=True)).alias("z"))
    back_a = " + ".join(f"shiftleft(shiftright(z, {2 * k}) & 1, {k})" for k in range(16))
    back_b = " + ".join(f"shiftleft(shiftright(z, {2 * k + 1}) & 1, {k})" for k in range(16))
    bad = (
        z.select("a", "b", F.expr(back_a).alias("ra"), F.expr(back_b).alias("rb"))
        .filter((F.col("a") != F.col("ra")) | (F.col("b") != F.col("rb")))
        .collect()
    )
    assert not bad, f"interleave not invertible for: {bad[:3]}"


@settings(max_examples=3, deadline=None)
@given(st.lists(names, min_size=1, max_size=15))
def test_entropy_bounds(spark, batch):
    """H13 — 0 ≤ entropy ≤ ln(n_types) (+1 ulp of rounding slack), and a
    doc of all-identical tokens has entropy exactly 0."""
    import math

    docs = [(i, t) for i, t in enumerate(batch)] + [(10_000, "same same same same")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    # drive the same expressions through a temp-view copy of the plan
    from australian_company_etl_spark.plans.text import text_entropy

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r for r in text_entropy(spark, d).collect()}
    for doc_id, r in out.items():
        if r.n_types > 0:
            assert -1e-9 <= r.entropy <= math.log(r.n_types) + 1e-4, (doc_id, r)
    assert out[10_000].entropy == 0.0


# ── codec properties: arbitrary pixel data round-trips every image codec ────


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=400),
    width=st.integers(min_value=1, max_value=40),
)
def test_png_bmp_roundtrip_exact_any_input(data, width):
    """PNG and BMP are lossless: decode(encode(x)) == x (zero-padded to the
    row grid) for arbitrary bytes and widths, through every filter path."""
    import numpy as np

    from australian_company_etl_spark.operators.multimodal import (
        bmp_decode,
        bmp_encode,
        png_decode,
        png_encode,
    )

    gray = np.frombuffer(data, dtype=np.uint8)
    for enc, dec in ((png_encode, png_decode), (bmp_encode, bmp_decode)):
        w, h, px = dec(enc(gray, width=width))
        assert w == width
        assert h == max(1, -(-len(gray) // width))
        assert np.array_equal(px[: len(gray)], gray)
        assert not px[len(gray) :].any()


@settings(max_examples=25, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=300),
    width=st.integers(min_value=1, max_value=32),
)
def test_jpeg_q100_bounded_error_any_input(data, width):
    """Baseline JPEG at quality=100 quantizes with an all-ones table, so
    the only loss is DCT float rounding — bounded by 2 grey levels for
    ARBITRARY input, the worst case being max-frequency patterns."""
    import numpy as np

    from australian_company_etl_spark.operators.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
    )

    gray = np.frombuffer(data, dtype=np.uint8)
    w, h, px = jpeg_decode(jpeg_encode(gray, width=width, quality=100))
    assert w == width and h == max(1, -(-len(gray) // width))
    if len(gray):
        err = np.abs(px[: len(gray)].astype(int) - gray.astype(int))
        assert err.max() <= 2


# ── exactmath: money sums cannot drift, float sums can ──────────────────────

money_2dp = st.integers(min_value=-10**9, max_value=10**9).map(lambda c: c / 100)


@settings(max_examples=5, deadline=None)
@given(st.lists(money_2dp, min_size=1, max_size=200), st.integers(1, 16))
def test_sum_cents_is_partition_invariant(spark, batch, nparts):
    """The property the q5 sf1 regression violated: an exact-cents sum must
    be identical under ANY partition layout (accumulation order), and must
    equal the Python-exact decimal answer. The float-sum twin is only
    guaranteed to match when partial sums stay in the double-exact range —
    which row counts at scale do not."""
    from decimal import Decimal

    from australian_company_etl_spark.functions.exactmath import sum_cents

    exact = float(sum(Decimal(str(v)) for v in batch))
    df = spark.createDataFrame([(v,) for v in batch], "value double")
    outs = {
        df.repartition(p).agg(sum_cents("value").alias("s")).first().s
        for p in (1, nparts)
    }
    assert outs == {round(exact, 2)}, f"{outs} != {round(exact, 2)}"


@settings(max_examples=5, deadline=None)
@given(st.lists(money_2dp, min_size=1, max_size=100))
def test_cents_matches_duckdb_twin(spark, batch):
    """Dual-dialect check without parquet: the Spark cents/sum_cents result
    equals DuckDB running the generated SQL over the same values."""
    import duckdb

    from australian_company_etl_spark.functions.exactmath import (
        sum_cents,
        sum_cents_sql,
    )

    spark_val = (
        spark.createDataFrame([(v,) for v in batch], "value double")
        .agg(sum_cents("value").alias("s"))
        .first()
        .s
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in batch])
    duck_val = con.execute(f"SELECT {sum_cents_sql('value')} FROM t").fetchone()[0]
    assert spark_val == duck_val


# ── BPE merge application: regex path == reference scan-and-skip-2 ──────────

bpe_symbols = st.lists(
    st.sampled_from(["a", "b", "ab", "c", "x1", "</w>"]), min_size=1, max_size=12
)


def _ref_merge(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(bpe_symbols, min_size=1, max_size=20),
    st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("ab", "a"), ("c", "</w>")]),
)
def test_bpe_merge_regex_equals_reference_scan(spark, batch, pair):
    """The lookaround regexp_replace merge must equal the reference BPE
    left-to-right scan-and-skip-2 on ANY symbol sequence — including
    overlapping occurrences (a,a on 'a a a') and adjacent occurrences
    sharing a boundary space ('a b a b'), and symbols that are prefixes
    of other symbols ('a' vs 'ab')."""
    from australian_company_etl_spark.plans.bpe import _apply_merge

    a, b = pair
    df = spark.createDataFrame(
        [(" ".join(s), 1) for s in batch], "s string, cnt long"
    )
    got = [r.s for r in _apply_merge(df, a, b).collect()]
    expect = [" ".join(_ref_merge(s, a, b)) for s in batch]
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 4)),  # (tie-dense order val, segment)
        min_size=1,
        max_size=120,
    ),
    st.integers(2, 5),  # n_parts — forces rows to straddle range partitions
    st.integers(1, 7),  # ntile k
)
def test_segmented_rank_and_ntile_equal_window_forms(spark, batch, nparts, k):
    """functions/ranks.py vs Spark's own window functions on ARBITRARY
    frames: for any (value, segment) multiset — tie-dense by construction
    (values drawn from 7, segments from 5) — the two-phase distributed
    `segmented_rank` must equal `row_number() OVER (PARTITION BY seg
    ORDER BY val, id)` row-for-row, `global_rank` the unpartitioned form,
    and `ntile_from_rank` must equal `ntile(k)` over the same total
    order. Pins the machinery every distributed-window rewrite (RFM,
    Pareto, curriculum, deciles) leans on, at partition counts small
    enough that range boundaries land INSIDE tie runs."""
    from pyspark.sql import Window

    from australian_company_etl_spark.functions.ranks import (
        global_rank,
        ntile_from_rank,
        segmented_rank,
    )

    rows = [(i, v, s) for i, (v, s) in enumerate(batch)]
    df = spark.createDataFrame(rows, "id bigint, val int, seg int")

    # segmented: two-phase vs window
    got = {
        (r.id): r.rnk
        for r in segmented_rank(
            df, ["seg"], [F.asc("val"), F.asc("id")], "rnk", n_parts=nparts
        ).collect()
    }
    w = Window.partitionBy("seg").orderBy(F.asc("val"), F.asc("id"))
    want = {
        r.id: r.rnk
        for r in df.withColumn("rnk", F.row_number().over(w)).collect()
    }
    assert got == want

    # global + ntile: two-phase vs window
    ranked = global_rank(df, [F.asc("val"), F.asc("id")], "rnk", n_parts=nparts)
    n = df.count()
    got_nt = {
        r.id: r.nt
        for r in ranked.withColumn(
            "nt", ntile_from_rank(F.col("rnk"), F.lit(n), k)
        ).collect()
    }
    wg = Window.orderBy(F.asc("val"), F.asc("id"))
    want_nt = {
        r.id: r.nt for r in df.withColumn("nt", F.ntile(k).over(wg)).collect()
    }
    assert got_nt == want_nt


def _ref_ntile(rank: int, n: int, k: int) -> int:
    """SQL-standard NTILE in exact python integer arithmetic."""
    q, m = divmod(n, k)
    head = m * (q + 1)
    if rank <= head:
        return (rank - 1) // (q + 1) + 1
    return m + (rank - head - 1) // q + 1


def test_ntile_from_rank_exact_at_edges_and_past_2_53(spark):
    """Deterministic boundary pins for ntile_from_rank (VERDICT r08 task 5):

    - q=0 (n < k): every row lands in its own leading bucket via the first
      CASE branch; the q-division in the other branch must never evaluate.
    - head boundary (rank == m*(q+1) and the next rank): the exact seam
      between the ceil-sized and floor-sized buckets.
    - n PAST 2^53: the old double-division form ((rank-1)/(q+1) truncated)
      loses integer resolution above 2^53 and mis-buckets near-boundary
      ranks; the IntegralDivide form must stay exact. n here is 2^60+3 —
      any double-rounding in the bucket arithmetic shows up as an
      off-by-one at the seams."""
    from australian_company_etl_spark.functions.ranks import ntile_from_rank

    cases = []
    for n, k in [(1, 5), (3, 7), (6, 7), (7, 7), (8, 7), (10, 3), (10, 10)]:
        for rank in range(1, n + 1):
            cases.append((rank, n, k))
    # past-2^53 seams: for each bucket boundary of NTILE(7) over n=2^60+3,
    # probe the last rank of one bucket and the first of the next
    big_n, big_k = 2**60 + 3, 7
    q, m = divmod(big_n, big_k)
    head = m * (q + 1)
    seams = [1, head, head + 1, big_n]
    for b in range(1, big_k):
        last = b * (q + 1) if b <= m else head + (b - m) * q
        seams += [last, min(last + 1, big_n)]
    cases += [(r, big_n, big_k) for r in seams]

    df = spark.createDataFrame(cases, "rank bigint, n bigint, k int")
    got = (
        df.withColumn("nt", ntile_from_rank(F.col("rank"), F.col("n"), big_k))
        .where(F.col("n") == big_n)
        .select("rank", "nt")
        .collect()
    )
    for r in got:
        assert r.nt == _ref_ntile(r.rank, big_n, big_k), (r.rank, big_n, big_k)
    # small-n edges: k varies per row, so evaluate per distinct k
    for n, k in {(c[1], c[2]) for c in cases if c[1] <= 10}:
        small = df.where((F.col("n") == n) & (F.col("k") == k)).withColumn(
            "nt", ntile_from_rank(F.col("rank"), F.col("n"), k)
        )
        for r in small.collect():
            assert r.nt == _ref_ntile(r.rank, n, k), (r.rank, n, k)
