"""Generate the large-scale bench dataset (≈sf1) by deterministic 10×
replication of /root/testdata/sf0.1 into <repo>/benchdata/sf1.

Fact tables are replicated with key offsets so every copy is a disjoint key
range (customer/orders/lineitem keys shift by replica × max+1). Document
text gets a per-replica token suffix for replicas > 0: token counts, shingle
counts, and the within-replica duplicate structure are exactly the original
corpus's, but vocabularies are disjoint across replicas — so the near-dup
pair count scales ~linearly (×10) instead of quadratically (×100 if the
copies were verbatim, which would make every document a cross-replica dup
and turn the minhash bench into a pathological all-dups workload).

Dimension/auxiliary tables (region nation supplier part events embeddings)
are copied as-is: dims scale sublinearly in TPC-H and none of the large-SF
headliners aggregates them.

Idempotent: skips generation when the output dir already has all tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPLICAS = 10
SRC_SF = "/root/testdata/sf0.1"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf1")
SCALED = ["customer", "orders", "lineitem", "documents"]
COPIED = ["region", "nation", "supplier", "part", "events", "embeddings"]


def _offsets(spark: SparkSession) -> dict[str, int]:
    def mx(table: str, col: str) -> int:
        from australian_company_etl_spark.sources.registry import load_tables

        df = load_tables(spark, SRC_SF, [table])[table]
        return int(df.agg(F.max(col)).first()[0]) + 1

    return {
        "cust": mx("customer", "c_custkey"),
        "ord": mx("orders", "o_orderkey"),
        "doc": mx("documents", "doc_id"),
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
    raise ValueError(name)


def is_ready(out_dir: str = OUT_DIR) -> bool:
    # a table dir counts only with its _SUCCESS marker: a generation killed
    # mid-write leaves the directory present but torn, and existence alone
    # would silently bench/verify against the corrupt table forever
    return all(
        os.path.exists(os.path.join(out_dir, f"{t}.parquet", "_SUCCESS"))
        for t in SCALED + COPIED
    )


def ensure(spark: SparkSession, out_dir: str = OUT_DIR) -> str:
    """Generate (once) and return the large bench dir."""
    if is_ready(out_dir):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    from australian_company_etl_spark.sources.registry import load_tables

    offs = _offsets(spark)
    for name in SCALED:
        parts = [_replica(spark, name, i, offs) for i in range(REPLICAS)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name in COPIED:
        load_tables(spark, SRC_SF, [name])[name].write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    return out_dir


if __name__ == "__main__":
    from australian_company_etl_spark.session import get_spark

    ensure(get_spark(app_name="make-benchdata"))
    print(OUT_DIR)
