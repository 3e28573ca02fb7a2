"""Skew-mitigation operators: explicit key salting.

AQE's skew-join splitting (on in `session.py`) handles most runtime skew,
but two patterns still need explicit salting at 100 TB:

- `salted_aggregate` — a groupBy where one key holds a large share of all
  rows (e.g. the empty-string normalized name, a boilerplate shingle): one
  reducer gets the whole key. Two-phase: salt → partial agg on
  (key, salt) → final agg on key. Correct for any associative+commutative
  aggregation given its (partial, final) pair.
- `salted_broadcast_join` — fact⋈dim where the dim is broadcastable:
  broadcasting already avoids shuffle skew entirely; provided as the
  explicit form of the pattern (replicate small side, never shuffle the
  hot key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase agg: (key, salt) partials → key finals.

    `partial_aggs` run per (key, salt); `final_aggs` combine the partials
    and must reference the partial output columns (e.g. partial
    ``sum(x) as s`` → final ``sum(s) as s``).
    """
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_broadcast_join(fact: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Hot-key-safe fact⋈dim: replicate the dim, never shuffle the fact."""
    return fact.join(F.broadcast(dim), on=on)
