"""Deterministic CLUSTERED embedding corpus for ANN recall measurement.

The stock testdata embeddings are near-random, so sign-LSH recall sits at
chance there and the G10 recall report cannot separate a good recall lever
from a bad one (VERDICT r04). Real embedding corpora are clustered — that
is the regime ANN indexes are built for — so this generator produces a
second embeddings table with explicit cluster structure, same schema as
``embeddings.parquet`` (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT):

    embedding(i) = centroid(i % n_clusters) + noise_scale * noise(i)

with every value derived from md5 (the make_benchdata determinism
discipline: no RNG state, byte-reproducible anywhere, and DuckDB can
reconstruct the same table for cross-engine checks). label = the true
cluster id, consistent with the label-blocked dedup ops.

With the defaults (10 clusters in 64-d, noise 0.4) same-cluster cosine
sits ~0.85-0.9 and cross-cluster near 0 — close neighbors share most
hyperplane signs, so bucketing methods can show their separation:
tests/test_vectors_skew.py pins the measured recall ordering
(multiprobe/mt3 > single-table lsh >> chance) on this table.

Usage: python scripts/make_clustered_embeddings.py <out_dir> [n_vectors]
"""

from __future__ import annotations

import hashlib
import sys

DIM = 64
N_CLUSTERS = 10
NOISE = 0.4


def _hvec(key: str, dim: int = DIM) -> list[float]:
    """Deterministic pseudo-random vector in [-1, 1)^dim from md5 — the
    same primitive as the LSH planes (plans/similarity.py:_plane)."""
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{key}:{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def clustered_rows(
    n: int = 2000, k: int = N_CLUSTERS, dim: int = DIM, noise: float = NOISE
) -> list[tuple[int, list[float], int]]:
    cents = [_hvec(f"cent{c}", dim) for c in range(k)]
    rows = []
    for i in range(n):
        c = i % k
        nz = _hvec(f"v{i}", dim)
        emb = [float(cents[c][d] + noise * nz[d]) for d in range(dim)]
        rows.append((i, emb, c))
    return rows


def write_clustered_embeddings(spark, out_dir: str, n: int = 2000) -> int:
    """Write ``{out_dir}/embeddings.parquet`` so every ANN plan runs on it
    unchanged (they address tables by sf_dir). Returns the row count."""
    df = spark.createDataFrame(
        clustered_rows(n), "vec_id bigint, embedding array<float>, label int"
    )
    df.repartition(8).write.mode("overwrite").parquet(
        out_dir.rstrip("/") + "/embeddings.parquet"
    )
    return n


if __name__ == "__main__":
    from australian_company_etl_spark.session import get_spark

    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="make-clustered-embeddings")
    print({"rows": write_clustered_embeddings(spark, out, n), "out": out})
