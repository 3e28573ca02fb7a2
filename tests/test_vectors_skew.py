"""Vectorized cosine (Pandas-UDF wide-vector path) + salting operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from australian_company_etl_spark.functions.vectors import cosine_expr, cosine_pandas_udf
from australian_company_etl_spark.operators.skew import salted_aggregate, salted_broadcast_join
from australian_company_etl_spark.sources.registry import load_tables


def test_pandas_cosine_matches_jvm_cosine(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e")).limit(200)
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(b, F.col("a.vec_id") == (F.col("b.vec_id") + 1) % 200).select(
        cosine_expr(F.col("a.e"), F.col("b.e")).alias("jvm"),
        cosine_pandas_udf(F.col("a.e"), F.col("b.e")).alias("arrow"),
    )
    rows = pairs.collect()
    assert rows
    for r in rows:
        assert abs(r.jvm - r.arrow) < 1e-9


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        partial_aggs=[F.sum("l_quantity").alias("s"), F.count("*").alias("n")],
        final_aggs=[F.sum("s").alias("s"), F.sum("n").alias("n")],
    ).collect()
    assert {(r.l_returnflag, round(r.s, 6), r.n) for r in plain} == {
        (r.l_returnflag, round(r.s, 6), r.n) for r in salted
    }
    # and the plan is genuinely two-phase: both groupings present
    plan = salted_aggregate(
        li,
        ["l_returnflag"],
        partial_aggs=[F.sum("l_quantity").alias("s")],
        final_aggs=[F.sum("s").alias("s")],
    )._jdf.queryExecution().sparkPlan().toString()
    assert "__salt" in plan


def test_salted_broadcast_join_is_broadcast(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    dim = t["customer"].withColumnRenamed("c_custkey", "o_custkey")
    out = salted_broadcast_join(t["orders"], dim, on=["o_custkey"])
    # the fact side must not shuffle: broadcast hash join in the plan
    assert "BroadcastHashJoin" in out._jdf.queryExecution().sparkPlan().toString()


def test_random_projection_preserves_norms_in_expectation(spark, sf_dir):
    """JL property: for a sign matrix, E[y_j^2] = ||x||^2 per output dim,
    so mean_j(y_j^2) / ||q||^2 concentrates near 1 (loose 3x bound at
    d'=16); and the projection must be exactly reproducible."""
    from pyspark.sql import functions as F

    from australian_company_etl_spark.plans.similarity import (
        _RP_SCALE,
        embed_random_projection,
    )
    from australian_company_etl_spark.sources.registry import load_tables

    out = embed_random_projection(spark, sf_dir)
    norms_proj = out.groupBy("vec_id").agg(
        F.avg(F.col("y_micro") * F.col("y_micro")).alias("mean_y2")
    )
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    q2 = F.aggregate(
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * _RP_SCALE).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x * x,
    )
    norms_in = emb.select("vec_id", q2.alias("q2"))
    joined = norms_proj.join(norms_in, "vec_id").collect()
    assert joined
    ratios = [r.mean_y2 / r.q2 for r in joined if r.q2 > 0]
    # per-vector: loose concentration bound
    assert all(0.2 < x < 5.0 for x in ratios)
    # corpus mean tightens hard around 1
    assert 0.7 < sum(ratios) / len(ratios) < 1.3
