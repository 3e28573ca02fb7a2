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
