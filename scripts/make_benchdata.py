"""Generate the large-scale bench datasets by deterministic replication of
/root/testdata/sf0.1 into <repo>/benchdata/sf1 (10×) and benchdata/sf10
(100× — the VERDICT r09 scale-trend decade).

Fact tables are replicated with key offsets so every copy is a disjoint key
range (customer/orders/lineitem keys shift by replica × max+1). Document
text gets a per-replica token suffix for replicas > 0: token counts, shingle
counts, and the within-replica duplicate structure are exactly the original
corpus's, but vocabularies are disjoint across replicas — so the near-dup
pair count scales ~linearly (×replicas) instead of quadratically (×replicas²
if the copies were verbatim, which would make every document a cross-replica
dup and turn the minhash bench into a pathological all-dups workload).

sf1 (bench history since round 6) keeps dimension/auxiliary tables
(region nation supplier part events embeddings) copied as-is — its recorded
numbers must stay comparable across rounds, so its replication scheme is
FROZEN. sf10 additionally scales the two "auxiliary fact" tables the sf1
scheme left at sf0.1 size, because the sf10 section's whole point is a
measured decade trend for EVERY headliner family:

- events: event_id/user_id shift per replica (disjoint users), timestamps
  unchanged — the same 30-day range carries 100× the rows, i.e. more users
  at the same wall-clock density, which is how an event stream actually
  grows (window keys stay fixed; per-window row count scales linearly).
- embeddings: vec_id shifts per replica; for replicas > 0 every component
  gets deterministic hash-derived noise in ±0.25 (component scale of the
  unit-normalized 64-d corpus is ~0.125), so cross-replica vectors are
  effectively independent — verbatim copies would be exact cross-replica
  duplicates, and since cosine sign-LSH is scale-invariant every bucketed
  plan would degenerate to an all-dups workload (the same pathology the
  document suffix avoids). Within-replica structure is NOT preserved for
  i > 0 (independent per-vector noise re-randomizes it); the bench measures
  candidate/join COST on a realistic bucket distribution, not recall.

Idempotent: skips generation when the output dir already has all tables
(per-table _SUCCESS markers, torn-write-safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_BENCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata")

REPLICAS = 10
SRC_SF = "/root/testdata/sf0.1"
OUT_DIR = os.path.join(_BENCH_ROOT, "sf1")
SCALED = ["customer", "orders", "lineitem", "documents"]
COPIED = ["region", "nation", "supplier", "part", "events", "embeddings"]

SF10_REPLICAS = 100
SF10_OUT_DIR = os.path.join(_BENCH_ROOT, "sf10")
SF10_SCALED = SCALED + ["events", "embeddings"]
SF10_COPIED = ["region", "nation", "supplier", "part"]

#: embedding perturbation amplitude (±) for cross-replica decorrelation
EMB_NOISE = 0.25


def _offsets(spark: SparkSession) -> dict[str, int]:
    def mx(table: str, col: str) -> int:
        from australian_company_etl_spark.sources.registry import load_tables

        df = load_tables(spark, SRC_SF, [table])[table]
        return int(df.agg(F.max(col)).first()[0]) + 1

    return {
        "cust": mx("customer", "c_custkey"),
        "ord": mx("orders", "o_orderkey"),
        "doc": mx("documents", "doc_id"),
        "ev": mx("events", "event_id"),
        "usr": mx("events", "user_id"),
        "vec": mx("embeddings", "vec_id"),
    }


def _replica(spark: SparkSession, name: str, i: int, offs: dict[str, int]):
    from australian_company_etl_spark.sources.registry import load_tables

    df = load_tables(spark, SRC_SF, [name])[name]
    if name == "customer":
        return df.withColumn("c_custkey", F.col("c_custkey") + i * offs["cust"])
    if name == "orders":
        return df.withColumn("o_orderkey", F.col("o_orderkey") + i * offs["ord"]).withColumn(
            "o_custkey", F.col("o_custkey") + i * offs["cust"]
        )
    if name == "lineitem":
        return df.withColumn("l_orderkey", F.col("l_orderkey") + i * offs["ord"])
    if name == "documents":
        out = df.withColumn("doc_id", F.col("doc_id") + i * offs["doc"])
        if i > 0:
            sfx = F.lit(str(i))
            out = out.withColumn(
                "text",
                F.array_join(
                    F.transform(F.split("text", " "), lambda x: F.concat(x, sfx)), " "
                ),
            )
        return out
    if name == "events":
        return df.withColumn("event_id", F.col("event_id") + i * offs["ev"]).withColumn(
            "user_id", F.col("user_id") + i * offs["usr"]
        )
    if name == "embeddings":
        out = df.withColumn("vec_id", F.col("vec_id") + i * offs["vec"])
        if i > 0:
            # deterministic murmur3 noise per (vec_id, dim, replica): hash →
            # pmod 1001 → [-500, 500] → ±EMB_NOISE. Cast back to float so
            # the replicated schema is byte-identical to the source's.
            out = out.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: x
                    + (F.pmod(F.hash(F.col("vec_id"), j, F.lit(i)), F.lit(1001)) - 500)
                    * F.lit(EMB_NOISE / 500.0),
                ).cast("array<float>"),
            )
        return out
    raise ValueError(name)


def is_ready(out_dir: str = OUT_DIR, tables: list[str] | None = None) -> bool:
    # a table dir counts only with its _SUCCESS marker: a generation killed
    # mid-write leaves the directory present but torn, and existence alone
    # would silently bench/verify against the corrupt table forever
    tables = tables if tables is not None else SCALED + COPIED
    return all(
        os.path.exists(os.path.join(out_dir, f"{t}.parquet", "_SUCCESS"))
        for t in tables
    )


def ensure(
    spark: SparkSession,
    out_dir: str = OUT_DIR,
    replicas: int = REPLICAS,
    scaled: list[str] | None = None,
    copied: list[str] | None = None,
) -> str:
    """Generate (once) and return a replicated bench dir."""
    scaled = scaled if scaled is not None else SCALED
    copied = copied if copied is not None else COPIED
    if is_ready(out_dir, scaled + copied):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    from australian_company_etl_spark.sources.registry import load_tables

    offs = _offsets(spark)
    for name in scaled:
        parts = [_replica(spark, name, i, offs) for i in range(replicas)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name in copied:
        load_tables(spark, SRC_SF, [name])[name].write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    return out_dir


def ensure_sf10(spark: SparkSession, out_dir: str = SF10_OUT_DIR) -> str:
    """Generate (once) and return the sf10 (100× sf0.1) scale-trend dir."""
    return ensure(
        spark,
        out_dir=out_dir,
        replicas=SF10_REPLICAS,
        scaled=SF10_SCALED,
        copied=SF10_COPIED,
    )


if __name__ == "__main__":
    import sys

    from australian_company_etl_spark.session import get_spark

    spark = get_spark(app_name="make-benchdata")
    if "--sf10" in sys.argv:
        ensure_sf10(spark)
        print(SF10_OUT_DIR)
    else:
        ensure(spark)
        print(OUT_DIR)
