"""Bench-corpus replication contract (scripts/make_benchdata.py).

The sf1/sf10 bench numbers are only meaningful if the replicated corpora
have the properties the generator's docstring claims: disjoint key ranges
per replica (no accidental cross-replica joins), per-replica disjoint
document vocabularies (near-dup pairs scale linearly, not quadratically),
events that keep their timestamps while users stay disjoint (window keys
fixed, per-window rows linear), and embeddings whose cross-replica vectors
are decorrelated (cosine sign-LSH is scale-invariant, so verbatim copies
would be exact cross-replica dups and every bucketed plan would degenerate
to the all-dups worst case). These assert at the DataFrame level — no
table writes — against the sf0.1 source the generator actually reads.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def offsets(spark):
    from scripts.make_benchdata import _offsets

    return _offsets(spark)


def test_events_replicas_disjoint_users_same_timestamps(spark, offsets):
    from scripts.make_benchdata import _replica

    r0 = _replica(spark, "events", 0, offsets)
    r1 = _replica(spark, "events", 1, offsets)
    a = r0.agg(
        F.max("event_id"), F.max("user_id"), F.min("ts"), F.max("ts"), F.count("*")
    ).first()
    b = r1.agg(
        F.min("event_id"), F.min("user_id"), F.min("ts"), F.max("ts"), F.count("*")
    ).first()
    assert a[0] < b[0] and a[1] < b[1], "event/user key ranges must be disjoint"
    assert (a[2], a[3]) == (b[2], b[3]), "timestamps must be unchanged per replica"
    assert a[4] == b[4]


def test_embedding_replicas_disjoint_ids_perturbed_floats(spark, offsets):
    from scripts.make_benchdata import _replica

    r0 = _replica(spark, "embeddings", 0, offsets)
    r1 = _replica(spark, "embeddings", 1, offsets)
    assert dict(r1.dtypes)["embedding"] == "array<float>", "schema must survive"
    lo_max = r0.agg(F.max("vec_id")).first()[0]
    hi_min = r1.agg(F.min("vec_id")).first()[0]
    assert lo_max < hi_min, "vec_id ranges must be disjoint"
    # replica 1's vector differs from the source vector it was copied from,
    # and the perturbation is deterministic (two builds agree exactly)
    src = {r["vec_id"]: r["embedding"] for r in r0.limit(5).collect()}
    off = offsets["vec"]
    per1 = {r["vec_id"] - off: r["embedding"] for r in r1.filter(F.col("vec_id") < off + 5).collect()}
    per2 = {r["vec_id"] - off: r["embedding"] for r in _replica(spark, "embeddings", 1, offsets).filter(F.col("vec_id") < off + 5).collect()}
    assert per1 == per2, "perturbation must be deterministic"
    assert all(src[k] != per1[k] for k in src), "replica >0 vectors must differ"


def test_document_replicas_disjoint_vocabulary(spark, offsets):
    from scripts.make_benchdata import _replica

    r0 = _replica(spark, "documents", 0, offsets).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    r1 = _replica(spark, "documents", 1, offsets).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    common = r0.distinct().join(r1.distinct(), "tok").count()
    assert common == 0, "replica vocabularies must be disjoint (suffix scheme)"


def test_candidate_stats_invariants(spark, sf_dir):
    """The sf10 bench section's Σ|bucket|² instrumentation must satisfy the
    relations the scale claims rest on: distinct candidate pairs never
    exceed the generated-pair bound; the knn join's ordered-pair count is
    exactly Σ n·(n−1); a tighter bucketing (more planes) strictly shrinks
    the candidate term on this corpus."""
    from australian_company_etl_spark.plans.dedup import (
        minhash_candidate_stats,
        setsim_candidate_stats,
    )
    from australian_company_etl_spark.plans.similarity import (
        knn_candidate_stats,
        knn_planes,
    )
    from australian_company_etl_spark.plans.text import inverted_index_stats

    mh = minhash_candidate_stats(spark, sf_dir)
    assert 0 < mh["cand_pairs"] <= mh["gen_pairs"]
    assert mh["max_bucket"] <= mh["rows"]

    ss = setsim_candidate_stats(spark, sf_dir)
    assert 0 < ss["cand_pairs"] <= ss["gen_pairs"]
    assert ss["prefix_rows"] > 0

    k8 = knn_candidate_stats(spark, sf_dir)
    k12 = knn_candidate_stats(spark, sf_dir, knn_planes(12))
    assert k8["n_planes"] == 8 and k12["n_planes"] == 12
    assert k8["buckets"] <= 256 and k12["buckets"] <= 4096
    assert k12["cand_pairs"] < k8["cand_pairs"], "more planes must shrink Σ|bucket|²"

    inv = inverted_index_stats(spark, sf_dir)
    assert inv["postings"] >= inv["tokens"] >= 1
    assert inv["max_df"] <= 500  # can't exceed the doc count at sf0.001


def test_sf10_scales_events_and_embeddings_sf1_does_not():
    from scripts.make_benchdata import COPIED, SCALED, SF10_COPIED, SF10_SCALED

    assert "events" in SF10_SCALED and "embeddings" in SF10_SCALED
    assert "events" in COPIED and "embeddings" in COPIED, "sf1 scheme is frozen"
    assert set(SCALED) < set(SF10_SCALED)
