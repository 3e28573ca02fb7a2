"""Group M — deterministic sketches for cardinality and distribution.

At 100 TB you don't count distincts exactly and you don't sort 100 TB to
get a percentile — you sketch. These are the deterministic (oracle-
checkable) counterparts of HyperLogLog / t-digest:

- M1 `sketch_kmv_distinct` — K-Minimum-Values cardinality estimate per
  event_type (k = 64): hash every distinct (event_type, user_id) with the
  portable 60-bit md5 hash, keep the k smallest hashes per group, estimate
  |D| ≈ (k-1) · 2^60 / h_(k). Unlike HLL the estimate is a pure function
  of the input, so Spark and DuckDB agree bit-for-bit. Spark keeps only k
  rows per group before the final aggregation via the WindowGroupLimit
  rewrite (rank-filter pushdown), so the shuffle is O(k · groups), not
  O(distinct) — the same partial-merge shape a real KMV aggregator has.
- M2 `quantiles_event_value` — exact interpolated percentiles (p50/p90/
  p99) of `value` per event_type: Spark `percentile` and DuckDB
  `quantile_cont` both define rank = p·(n-1) with linear interpolation, so
  the doubles match. At 100 TB the drop-in is `percentile_approx`
  (Greenwald-Khanna) with the same call shape.

Reference parity: run_quality_checks.py:64-78 profiles the confidence
distribution with fixed buckets; these are the sketch-grade versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from australian_company_etl_spark.functions.textfns import phash_sql, phash_spark
from australian_company_etl_spark.sources.registry import load_tables

KMV_K = 64


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — KMV distinct-user estimate per event_type vs exact count."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    pairs = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn("h", phash_spark(F.col("user_id").cast("string")))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kept = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= KMV_K)
    sketch = kept.groupBy("event_type").agg(
        F.max("h").alias("kth_hash"), F.count("*").alias("k_actual")
    )
    exact = pairs.groupBy("event_type").agg(F.count("*").alias("n_distinct_exact"))
    est = F.when(
        F.col("k_actual") < KMV_K, F.col("n_distinct_exact").cast("double")
    ).otherwise(
        (F.lit(KMV_K - 1) * F.pow(F.lit(2.0), F.lit(60)))
        / F.col("kth_hash").cast("double")
    )
    return (
        sketch.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_distinct_exact",
            F.round(est, 4).alias("kmv_estimate"),
        )
    )


KMV_SQL = f"""
WITH pairs AS (
  SELECT event_type, user_id, {phash_sql("user_id::VARCHAR")} AS h
  FROM (SELECT DISTINCT event_type, user_id FROM events)
),
kept AS (
  SELECT event_type, h
  FROM pairs
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= {KMV_K}
),
sketch AS (
  SELECT event_type, max(h) AS kth_hash, count(*) AS k_actual FROM kept GROUP BY 1
),
exact AS (
  SELECT event_type, count(*) AS n_distinct_exact FROM pairs GROUP BY 1
)
SELECT s.event_type,
       e.n_distinct_exact,
       round(CASE WHEN s.k_actual < {KMV_K} THEN e.n_distinct_exact::DOUBLE
                  ELSE {KMV_K - 1} * pow(2.0, 60) / s.kth_hash::DOUBLE END,
             4) AS kmv_estimate
FROM sketch s JOIN exact e USING (event_type)
"""


def quantiles_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — exact interpolated p50/p90/p99 of value per event_type."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    pct = F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(pct[0], 6).alias("p50"),
        F.round(pct[1], 6).alias("p90"),
        F.round(pct[2], 6).alias("p99"),
    )


QUANTILES_SQL = """
SELECT event_type,
       count(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


BLOOM_M = 1024  # bits per filter
BLOOM_K = 3  # hash functions


def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — Bloom-filter membership per event_type: build one m=1024/k=3
    filter over each type's distinct user set, then probe EVERY distinct
    user against EVERY type's filter, reporting the bloom verdict next to
    exact membership — the false-positive rows are the sketch's signature.

    The filter is held relationally as distinct (event_type, bit) rows so
    the DuckDB oracle reproduces it bit-for-bit with the same portable md5
    hash. At 100 TB you pack the bits into array<long> with a bit_or
    aggregate (or Spark's own bloom_filter_agg) and broadcast the blobs —
    the build/probe dataflow (small filter side broadcast onto a huge
    probe stream) is exactly this plan's shape.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    members = ev.select("event_type", "user_id").distinct()
    seeds = F.array(*[F.lit(i) for i in range(BLOOM_K)])
    bit_of = lambda seed, uid: (
        phash_spark(F.concat(seed.cast("string"), F.lit(":"), uid.cast("string"))) % BLOOM_M
    )
    bits = (
        members.select(
            "event_type", F.explode(seeds).alias("i"), F.col("user_id").alias("uid")
        )
        .select("event_type", bit_of(F.col("i"), F.col("uid")).alias("bit"))
        .distinct()
    )
    types = ev.select("event_type").distinct()
    users = ev.select("user_id").distinct()
    probe = users.crossJoin(F.broadcast(types)).select(
        "event_type", "user_id", F.explode(seeds).alias("i")
    )
    hits = (
        probe.withColumn("bit", bit_of(F.col("i"), F.col("user_id")))
        .join(F.broadcast(bits), ["event_type", "bit"], "left_semi")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("nbits"))
    )
    exact = members.withColumn("is_member", F.lit(True))
    return (
        users.crossJoin(F.broadcast(types))
        .join(hits, ["event_type", "user_id"], "left")
        .join(exact, ["event_type", "user_id"], "left")
        .select(
            "event_type",
            "user_id",
            (F.coalesce("nbits", F.lit(0)) == BLOOM_K).alias("bloom_maybe"),
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
        )
    )


def _bloom_sql() -> str:
    def bit_expr(seed: str, uid: str) -> str:
        concat = seed + "::VARCHAR || ':' || " + uid + "::VARCHAR"
        return f"({phash_sql(concat)} % {BLOOM_M})"

    return f"""
WITH members AS (SELECT DISTINCT event_type, user_id FROM events),
seeds(i) AS (VALUES (0), (1), (2)),
bits AS (
  SELECT DISTINCT event_type, {bit_expr('i', 'user_id')} AS bit
  FROM members, seeds
),
types AS (SELECT DISTINCT event_type FROM events),
users AS (SELECT DISTINCT user_id FROM events),
probe AS (
  SELECT t.event_type, u.user_id, s.i,
         {bit_expr('s.i', 'u.user_id')} AS bit
  FROM users u, types t, seeds s
),
hits AS (
  SELECT p.event_type, p.user_id, count(*) AS nbits
  FROM probe p
  WHERE EXISTS (SELECT 1 FROM bits b
                WHERE b.event_type = p.event_type AND b.bit = p.bit)
  GROUP BY p.event_type, p.user_id
)
SELECT t.event_type, u.user_id,
       coalesce(h.nbits, 0) = {BLOOM_K} AS bloom_maybe,
       (m.user_id IS NOT NULL) AS is_member
FROM users u
CROSS JOIN types t
LEFT JOIN hits h ON h.event_type = t.event_type AND h.user_id = u.user_id
LEFT JOIN members m ON m.event_type = t.event_type AND m.user_id = u.user_id
"""


# ── M4: count-min heavy hitters ─────────────────────────────────────────────

CMS_DEPTH = 3
CMS_WIDTH = 32
CMS_HEAVY_FRAC = 20  # heavy hitter = estimated count >= stream_size / 20 (5%)


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — count-min sketch: per-user event counts estimated from a
    CMS_DEPTH × CMS_WIDTH counter table (min over rows of the hashed
    bucket's count), flagged heavy when the estimate crosses the
    5%-of-stream threshold. CMS never underestimates (est ≥ exact), and with
    independent row hashes the overestimate is bounded by collisions.

    Scale: the sketch build is one map-side-combined groupBy over
    depth×width = 96 counters — mergeable across partitions/days exactly
    like a production CMS; the per-key probe joins the tiny counter table
    broadcast. The exact count column exists only to exhibit the error
    bound; a real 100 TB run would keep just the sketch."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    buckets = [
        F.struct(
            F.lit(d).alias("d"),
            (phash_spark(F.concat(F.lit(f"cms{d}:"), F.col("user_id").cast("string"))) % CMS_WIDTH).alias("b"),
        )
        for d in range(CMS_DEPTH)
    ]
    rows = ev.select("user_id", F.explode(F.array(*buckets)).alias("x")).select(
        "user_id", F.col("x.d").alias("d"), F.col("x.b").alias("b")
    )
    cms = rows.groupBy("d", "b").agg(F.count("*").alias("c"))
    keys = rows.groupBy("user_id", "d", "b").agg(F.count("*").alias("n_key"))
    probed = (
        keys.join(F.broadcast(cms), ["d", "b"])
        .groupBy("user_id")
        .agg(F.min("c").alias("n_est"), F.max("n_key").alias("n_exact"))
    )
    # stream size folds in as a broadcast 1-row aggregate (the sibling
    # plans' idiom) — the previous eager ev.count() ran a full extra
    # scan of events as a blocking driver action at plan-BUILD time
    total = ev.agg(F.count("*").alias("total"))
    return probed.crossJoin(F.broadcast(total)).select(
        "user_id",
        "n_exact",
        "n_est",
        (F.col("n_est") * CMS_HEAVY_FRAC >= F.col("total")).alias("is_heavy"),
    )


def _cms_sql() -> str:
    parts = []
    for d in range(CMS_DEPTH):
        h = phash_sql(f"'cms{d}:' || user_id::VARCHAR")
        parts.append(f"SELECT user_id, {d} AS d, {h} % {CMS_WIDTH} AS b FROM events")
    bucket_rows = " UNION ALL ".join(parts)
    return f"""
WITH rows_ AS ({bucket_rows}),
cms AS (SELECT d, b, count(*) AS c FROM rows_ GROUP BY d, b),
keys_ AS (SELECT user_id, d, b, count(*) AS n_key FROM rows_ GROUP BY 1, 2, 3)
SELECT k.user_id,
       max(k.n_key) AS n_exact,
       min(cms.c) AS n_est,
       (min(cms.c) * {CMS_HEAVY_FRAC} >= (SELECT count(*) FROM events)) AS is_heavy
FROM keys_ k JOIN cms USING (d, b)
GROUP BY k.user_id
"""




# ── M5: portable HyperLogLog ────────────────────────────────────────────────

HLL_M = 64  # registers (p = 6)
HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007)


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — HyperLogLog distinct-user estimate per event_type, made fully
    portable/deterministic (Flajolet et al. 2007; production twin:
    `approx_count_distinct`, whose register layout is engine-private and
    therefore un-oracle-able).

    Register build: bucket = h mod 64 over the portable 60-bit hash; rho =
    leading zeros of the remaining 54 bits + 1 = 55 − bitlength(h div 64),
    with bitlength computed EXACTLY via length(bin(x)) in both engines —
    no float log2, no ulp risk at power-of-two boundaries. The harmonic
    mean is likewise exact: Z = Σ 2^(55−M_j) summed as BIGINT (each term
    ≤ 2^54, 64 terms < 2^61), so the only float ops are one multiply-divide
    at the end plus the small-range linear-counting branch, identical
    expressions in both dialects, rounded to 4dp.

    Scale: duplicates never shuffle — the (event_type, bucket) max(rho)
    aggregation combines map-side to ≤ 64 rows per group, the same
    mergeable-register shape as a production HLL aggregator (union of two
    sketches = elementwise max), and the estimate is a 64-row-per-group
    reduction. This is why HLL beats exact distinct at 100 TB: state is
    64 registers per group, not |D| rows.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    hashed = ev.select(
        "event_type", phash_spark(F.col("user_id").cast("string")).alias("h")
    )
    buckets = hashed.select(
        "event_type",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("r"),
    ).withColumn(
        "rho",
        F.when(F.col("r") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.bin(F.col("r")))
        ),
    )
    regs = buckets.groupBy("event_type", "bucket").agg(F.max("rho").alias("m_reg"))
    agg = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m_reg)")).alias("z_present"),
        F.count("*").alias("n_present"),
    )
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_distinct_exact"))
    )
    z = F.col("z_present") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 55)
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        * F.pow(F.lit(2.0), F.lit(55))
        / z.cast("double")
    )
    v = F.lit(HLL_M) - F.col("n_present")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n_distinct_exact",
        "n_present",
        F.round(est, 4).alias("hll_estimate"),
    )


def sketch_hll_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — HLL MERGEABILITY, demonstrated as the production dataflow: one
    64-register sketch is built per (event_type, DAY) — the per-partition
    partial a daily ingest job would persist — and the per-type cardinality
    is answered by MERGING the daily sketches (elementwise register max,
    associative + commutative + idempotent) without revisiting raw events.
    Because max is associative, merge(daily partials) is REGISTER-IDENTICAL
    to the all-data sketch — asserted against M5 in tests.

    This is the whole reason sketches win at 100 TB: yesterday's raw events
    can be archived; the 64-register partial answers every future union.

    Scale: per-day build combines map-side to ≤64 rows per (type, day);
    the merge is a ≤64-rows-per-group max-agg — bytes, not data."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    hashed = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        phash_spark(F.col("user_id").cast("string")).alias("h"),
    )
    buckets = hashed.select(
        "event_type",
        "day",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("r"),
    ).withColumn(
        "rho",
        F.when(F.col("r") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.bin(F.col("r")))
        ),
    )
    regs_day = buckets.groupBy("event_type", "day", "bucket").agg(
        F.max("rho").alias("m_reg")
    )
    merged = regs_day.groupBy("event_type", "bucket").agg(F.max("m_reg").alias("m_reg"))
    n_days = regs_day.select("event_type", "day").distinct().groupBy("event_type").agg(
        F.count("*").alias("n_days")
    )
    agg = merged.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m_reg)")).alias("z_present"),
        F.count("*").alias("n_present"),
    )
    z = F.col("z_present") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 55)
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        * F.pow(F.lit(2.0), F.lit(55))
        / z.cast("double")
    )
    v = F.lit(HLL_M) - F.col("n_present")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.join(F.broadcast(n_days), "event_type").select(
        "event_type",
        F.col("n_days").cast("int").alias("n_days"),
        "n_present",
        F.round(est, 4).alias("hll_estimate"),
    )


def _hll_merge_sql() -> str:
    h = phash_sql("user_id::VARCHAR")
    return f"""
WITH buckets AS (
  SELECT event_type, ts::DATE AS day,
         {h} % {HLL_M} AS bucket,
         {h} // {HLL_M} AS r
  FROM events
), rho_ AS (
  SELECT event_type, day, bucket,
         CASE WHEN r = 0 THEN 55 ELSE 55 - length(bin(r)) END AS rho
  FROM buckets
), regs_day AS (
  SELECT event_type, day, bucket, max(rho) AS m_reg FROM rho_ GROUP BY 1, 2, 3
), merged AS (
  SELECT event_type, bucket, max(m_reg) AS m_reg FROM regs_day GROUP BY 1, 2
), n_days AS (
  SELECT event_type, count(DISTINCT day) AS n_days FROM regs_day GROUP BY 1
), agg AS (
  SELECT event_type,
         sum(1::BIGINT << (55 - m_reg))::BIGINT AS z_present,
         count(*) AS n_present
  FROM merged GROUP BY 1
)
SELECT a.event_type,
       d.n_days::INT AS n_days,
       a.n_present,
       round(
         CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M}) * pow(2.0, 55)
                   / (a.z_present + ({HLL_M} - a.n_present) * (1::BIGINT << 55))::DOUBLE
                   <= {2.5 * HLL_M}
               AND ({HLL_M} - a.n_present) > 0
              THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - a.n_present)::DOUBLE)
              ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}) * pow(2.0, 55)
                   / (a.z_present + ({HLL_M} - a.n_present) * (1::BIGINT << 55))::DOUBLE
         END, 4) AS hll_estimate
FROM agg a JOIN n_days d USING (event_type)
"""


def _hll_sql() -> str:
    h = phash_sql("user_id::VARCHAR")
    return f"""
WITH buckets AS (
  SELECT event_type,
         {h} % {HLL_M} AS bucket,
         {h} // {HLL_M} AS r
  FROM events
), rho_ AS (
  SELECT event_type, bucket,
         CASE WHEN r = 0 THEN 55 ELSE 55 - length(bin(r)) END AS rho
  FROM buckets
), regs AS (
  SELECT event_type, bucket, max(rho) AS m_reg FROM rho_ GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         sum(1::BIGINT << (55 - m_reg))::BIGINT AS z_present,
         count(*) AS n_present
  FROM regs GROUP BY 1
), exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_distinct_exact
  FROM events GROUP BY 1
)
SELECT a.event_type,
       e.n_distinct_exact,
       a.n_present,
       round(
         CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M}) * pow(2.0, 55)
                   / (a.z_present + ({HLL_M} - a.n_present) * (1::BIGINT << 55))::DOUBLE
                   <= {2.5 * HLL_M}
               AND ({HLL_M} - a.n_present) > 0
              THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - a.n_present)::DOUBLE)
              ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}) * pow(2.0, 55)
                   / (a.z_present + ({HLL_M} - a.n_present) * (1::BIGINT << 55))::DOUBLE
         END, 4) AS hll_estimate
FROM agg a JOIN exact e USING (event_type)
"""


THETA_MAX = 1 << 60  # hash domain bound; theta for a not-yet-full sketch


def sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — theta-sketch set algebra: estimated |A ∪ B| and |A ∩ B| for
    every pair of event-type audiences (distinct users), from the same
    bottom-k KMV sketches M1 builds. Union keeps the surviving hashes of
    both sketches below θ = min(θ_A, θ_B); intersection keeps hashes
    present in both; estimate = |kept| · 2^60 / θ. A sketch that never
    filled (k_actual < k) has θ = 2^60 and degrades to exact counting.
    Exact pair counts ride alongside for error inspection — the M1
    pattern.

    This is the 100 TB audience-overlap answer: per-type sketches are
    O(k) rows, mergeable (set algebra needs only the sketches, never the
    raw data), and the pairwise stage touches 5 sketches of ≤64 hashes —
    the exact-count twin would re-shuffle every (user, type) pair per
    audience comparison. Deterministic (pure function of the input), so
    Spark and DuckDB agree bit-for-bit, unlike library theta sketches
    with seeded hash families.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    pairs = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn("h", phash_spark(F.col("user_id").cast("string")))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    meta = ranked.groupBy("event_type").agg(
        F.count("*").alias("k_actual"), F.max("h").alias("max_h")
    )
    meta = meta.select(
        "event_type",
        F.when(F.col("k_actual") >= KMV_K, F.col("max_h"))
        .otherwise(F.lit(THETA_MAX))
        .alias("theta"),
    )
    kept = (
        ranked.join(F.broadcast(meta), "event_type")
        .filter(F.col("h") < F.col("theta"))
        .select("event_type", "h")
    )
    pm = (
        meta.alias("a")
        .join(
            F.broadcast(meta.alias("b")),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.least("a.theta", "b.theta").alias("theta_ab"),
        )
    )
    ka = kept.select(F.col("event_type").alias("type_a"), "h")
    kb = kept.select(F.col("event_type").alias("type_b"), "h")
    ua = pm.join(F.broadcast(ka), "type_a").filter(F.col("h") < F.col("theta_ab"))
    ub = pm.join(F.broadcast(kb), "type_b").filter(F.col("h") < F.col("theta_ab"))
    un = (
        ua.select("type_a", "type_b", "theta_ab", "h")
        .unionByName(ub.select("type_a", "type_b", "theta_ab", "h"))
        .distinct()
        .groupBy("type_a", "type_b", "theta_ab")
        .agg(F.count("*").alias("n_union_kept"))
    )
    inter = (
        ua.select("type_a", "type_b", "h")
        .join(F.broadcast(ub.select("type_a", "type_b", "h")), ["type_a", "type_b", "h"])
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_inter_kept"))
    )
    # exact pair counts from the distinct (type, user) pairs, one self-join
    # on user_id (each user carries ≤ |types| rows — bounded at any scale)
    pa = pairs.select(F.col("event_type").alias("type_a"), "user_id")
    pb = pairs.select(F.col("event_type").alias("type_b"), "user_id")
    exact_inter = (
        pa.join(pb, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_exact_inter"))
    )
    per_type = pairs.groupBy("event_type").agg(F.count("*").alias("n"))
    est = lambda n: F.round(  # noqa: E731 — local estimate formula
        n.cast("double") * F.pow(F.lit(2.0), F.lit(60)) / F.col("theta_ab").cast("double"),
        4,
    )
    return (
        un.join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .join(F.broadcast(exact_inter), ["type_a", "type_b"], "left")
        .join(
            F.broadcast(per_type.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(per_type.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            (F.col("n_a") + F.col("n_b") - F.coalesce("n_exact_inter", F.lit(0))).alias(
                "n_exact_union"
            ),
            F.coalesce("n_exact_inter", F.lit(0)).alias("n_exact_inter"),
            est(F.col("n_union_kept")).alias("theta_union_est"),
            est(F.coalesce(F.col("n_inter_kept"), F.lit(0))).alias("theta_inter_est"),
        )
    )


THETA_SETOPS_SQL = f"""
WITH pairs AS (
  SELECT event_type, user_id, {phash_sql("user_id::VARCHAR")} AS h
  FROM (SELECT DISTINCT event_type, user_id FROM events)
),
ranked AS (
  SELECT event_type, h FROM pairs
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= {KMV_K}
),
meta AS (
  SELECT event_type,
         CASE WHEN count(*) >= {KMV_K} THEN max(h) ELSE {THETA_MAX} END AS theta
  FROM ranked GROUP BY 1
),
kept AS (
  SELECT r.event_type, r.h FROM ranked r JOIN meta m ON r.event_type = m.event_type
  WHERE r.h < m.theta
),
pm AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         least(a.theta, b.theta) AS theta_ab
  FROM meta a JOIN meta b ON a.event_type < b.event_type
),
ua AS (
  SELECT pm.type_a, pm.type_b, pm.theta_ab, k.h
  FROM pm JOIN kept k ON k.event_type = pm.type_a AND k.h < pm.theta_ab
),
ub AS (
  SELECT pm.type_a, pm.type_b, pm.theta_ab, k.h
  FROM pm JOIN kept k ON k.event_type = pm.type_b AND k.h < pm.theta_ab
),
un AS (
  SELECT type_a, type_b, theta_ab, count(*) AS n_union_kept
  FROM (SELECT DISTINCT type_a, type_b, theta_ab, h
        FROM (SELECT * FROM ua UNION ALL SELECT * FROM ub))
  GROUP BY 1, 2, 3
),
inter AS (
  SELECT ua.type_a, ua.type_b, count(*) AS n_inter_kept
  FROM ua JOIN ub ON ua.type_a = ub.type_a AND ua.type_b = ub.type_b AND ua.h = ub.h
  GROUP BY 1, 2
),
exact_inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_exact_inter
  FROM pairs a JOIN pairs b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, count(*) AS n FROM pairs GROUP BY 1
)
SELECT un.type_a, un.type_b,
       (na.n + nb.n - coalesce(e.n_exact_inter, 0)) AS n_exact_union,
       coalesce(e.n_exact_inter, 0) AS n_exact_inter,
       round(un.n_union_kept::DOUBLE * pow(2.0, 60) / un.theta_ab::DOUBLE, 4) AS theta_union_est,
       round(coalesce(i.n_inter_kept, 0)::DOUBLE * pow(2.0, 60) / un.theta_ab::DOUBLE, 4) AS theta_inter_est
FROM un
LEFT JOIN inter i ON i.type_a = un.type_a AND i.type_b = un.type_b
LEFT JOIN exact_inter e ON e.type_a = un.type_a AND e.type_b = un.type_b
JOIN per_type na ON na.event_type = un.type_a
JOIN per_type nb ON nb.event_type = un.type_b
"""


def sketch_bottomk_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 — mergeable uniform sampling: a bottom-k hash sample (the
    deterministic 'reservoir') built per (event_type, day) — the daily
    partial a pipeline persists — then merged by re-ranking the union,
    compared against the bottom-k computed directly from all data. The
    M6-style mergeability proof for SAMPLING: merge(daily partials) ==
    sample(whole), the property that lets a pipeline keep a uniform
    user sample forever without re-reading archived days.

    Scale: daily partials are O(k) rows per (type, day); the merge
    re-rank touches only partials. Output: per type, the k-th hash and
    sample size from both paths plus an `identical` flag (proven true on
    this corpus — asserted, not assumed)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    pairs = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            phash_spark(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
    )
    wd = Window.partitionBy("event_type", "day").orderBy("h")
    daily = (
        pairs.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
    )
    wm = Window.partitionBy("event_type").orderBy("h")
    merged = (
        daily.distinct()
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth_merged"), F.count("*").alias("k_merged"))
    )
    direct = (
        pairs.select("event_type", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth_direct"), F.count("*").alias("k_direct"))
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "k_merged",
        "k_direct",
        "kth_merged",
        "kth_direct",
        (
            (F.col("k_merged") == F.col("k_direct"))
            & (F.col("kth_merged") == F.col("kth_direct"))
        ).alias("identical"),
    )


BOTTOMK_MERGE_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT event_type, ts::DATE AS day,
         {phash_sql("user_id::VARCHAR")} AS h
  FROM events
),
daily AS (
  SELECT event_type, h FROM pairs
  QUALIFY row_number() OVER (PARTITION BY event_type, day ORDER BY h) <= {KMV_K}
),
merged AS (
  SELECT event_type, max(h) AS kth_merged, count(*) AS k_merged
  FROM (
    SELECT event_type, h FROM (SELECT DISTINCT event_type, h FROM daily)
    QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= {KMV_K}
  ) GROUP BY 1
),
direct AS (
  SELECT event_type, max(h) AS kth_direct, count(*) AS k_direct
  FROM (
    SELECT event_type, h FROM (SELECT DISTINCT event_type, h FROM pairs)
    QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= {KMV_K}
  ) GROUP BY 1
)
SELECT m.event_type, m.k_merged, d.k_direct, m.kth_merged, d.kth_direct,
       (m.k_merged = d.k_direct AND m.kth_merged = d.kth_direct) AS identical
FROM merged m JOIN direct d ON m.event_type = d.event_type
"""


HLL_WIN_DAYS = 7  # trailing window width for the sliding distinct


def sketch_hll_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 — SLIDING-window distinct (trailing-7-day active users per
    event_type, one row per window end day) answered from the M6 daily
    register partials. COUNT(DISTINCT) cannot be windowed-summed — a user
    active on 5 of the 7 days must count once — so the scalable form is:
    persist one 64-register HLL per (type, day), and for each window end
    merge the trailing days' partials by elementwise register max. Raw
    events are touched once, ever; every window is answered from O(64)
    rows per (type, day), and yesterday's windows never recompute.

    The exact trailing distinct is computed alongside as the validation
    twin (the same role as M5's exact column); a production pipeline
    drops it — it is the O(|D| x W) recompute the sketch path exists to
    avoid. Registers, harmonic sum, and the estimate reuse M5's
    integer-exact construction (hash div/mod, bitlength via bin-length,
    Z summed as BIGINT), so both dialects agree to the printed 4dp.

    Scale: regs_day combines map-side to <=64 rows per (type, day); the
    window expansion joins those partials against the broadcast day dim
    (a range condition over a calendar — O(64 x W) rows per window, bytes
    not data); the merge is a max-agg on (type, win_end, bucket).
    Reference parity: generalizes quality_checks.py:21-38's distinct
    counting to the moving-window form a daily ingest needs."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    hashed = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        phash_spark(F.col("user_id").cast("string")).alias("h"),
    )
    buckets = hashed.select(
        "event_type",
        "day",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("r"),
    ).withColumn(
        "rho",
        F.when(F.col("r") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.bin(F.col("r")))
        ),
    )
    regs_day = buckets.groupBy("event_type", "day", "bucket").agg(
        F.max("rho").alias("m_reg")
    )
    days = regs_day.select("event_type", F.col("day").alias("win_end")).distinct()

    def in_window(left, right_days):
        # explicit aliases: `days` shares lineage with regs_day, so the
        # equi-key must be disambiguated or Spark may resolve both sides
        # to the same attribute
        l, d = left.alias("l"), right_days.alias("d")
        return l.join(
            F.broadcast(d),
            (F.col("l.event_type") == F.col("d.event_type"))
            & (F.col("l.day") <= F.col("d.win_end"))
            & (F.col("l.day") > F.date_sub(F.col("d.win_end"), HLL_WIN_DAYS)),
        ).select("l.*", "d.win_end")

    win_regs = (
        in_window(regs_day, days)
        .groupBy("event_type", "win_end", "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    n_days = (
        in_window(regs_day.select("event_type", "day").distinct(), days)
        .groupBy("event_type", "win_end")
        .agg(F.count("*").cast("int").alias("n_days_in_win"))
    )
    # Exact validation twin via per-user coverage INTERVALS + a delta
    # cumulative sum (r12 optimization round, guide §2.3/§8) instead of the
    # old `in_window(raw events) → countDistinct`: that form expanded every
    # event row into each of the ≤W windows covering it — measured 60.2M
    # rows / 737 MB through one exchange at the sf10 tier, 86% of the whole
    # query's executor time — to validate windows answerable from ~8M
    # distinct (type, day, user) triples. Equivalence (exact, not
    # approximate): a user counts in the window ending at e iff some active
    # day d has e ∈ [d, d+W-1]; truncating each day's interval at the
    # user's next active day makes the per-user intervals DISJOINT, so
    # +1/−1 deltas at [start, end+1) summed cumulatively over day give, at
    # any e, exactly |{users active in (e−W, e]}| — the same integer
    # count(DISTINCT user_id) computed per window before. NULL user/day
    # rows are excluded up front exactly as countDistinct and the old
    # join's null-rejecting equi/range conditions excluded them. The heavy
    # shuffle is now the ~rows-sized distinct + one per-user sort; windows
    # are answered from O(types × days) delta rows.
    triples = (
        ev.select("event_type", F.to_date("ts").alias("day"), "user_id")
        .filter(F.col("user_id").isNotNull() & F.col("day").isNotNull())
        .distinct()
    )
    wu = Window.partitionBy("event_type", "user_id").orderBy("day")
    cover_end = F.date_add(F.col("day"), HLL_WIN_DAYS - 1)
    nxt = F.lead("day").over(wu)
    iv = triples.select(
        "event_type",
        F.col("day").alias("start"),
        F.when(
            nxt.isNotNull() & (nxt <= cover_end), F.date_sub(nxt, 1)
        ).otherwise(cover_end).alias("end"),
    )
    deltas = (
        iv.select("event_type", F.col("start").alias("day"), F.lit(1).alias("delta"))
        .unionAll(
            iv.select(
                "event_type",
                F.date_add(F.col("end"), 1).alias("day"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("event_type", "day")
        .agg(F.sum("delta").alias("d"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = deltas.withColumn("cum", F.sum("d").over(wc)).alias("c")
    dd = days.alias("d")
    # LEFT join + coalesce(0): a window whose events all carry NULL user_id
    # has no coverage interval at all, but the old countDistinct form still
    # emitted its row with an exact count of 0 — preserve that row.
    exact = (
        dd.join(
            F.broadcast(cum),
            (F.col("c.event_type") == F.col("d.event_type"))
            & (F.col("c.day") <= F.col("d.win_end")),
            "left",
        )
        .groupBy("d.event_type", "d.win_end")
        .agg(
            F.coalesce(
                F.max_by("cum", F.col("c.day")), F.lit(0).cast("bigint")
            ).alias("n_distinct_exact")
        )
        .select(
            F.col("event_type"), F.col("win_end"), F.col("n_distinct_exact")
        )
    )
    agg = win_regs.groupBy("event_type", "win_end").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m_reg)")).alias("z_present"),
        F.count("*").alias("n_present"),
    )
    z = F.col("z_present") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 55)
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        * F.pow(F.lit(2.0), F.lit(55))
        / z.cast("double")
    )
    v = F.lit(HLL_M) - F.col("n_present")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return (
        agg.join(F.broadcast(n_days), ["event_type", "win_end"])
        .join(F.broadcast(exact), ["event_type", "win_end"])
        .select(
            "event_type",
            "win_end",
            "n_days_in_win",
            "n_distinct_exact",
            F.round(est, 4).alias("hll_estimate"),
        )
    )


def _hll_sliding_sql() -> str:
    h = phash_sql("user_id::VARCHAR")
    return f"""
WITH buckets AS (
  SELECT event_type, ts::DATE AS day,
         {h} % {HLL_M} AS bucket,
         {h} // {HLL_M} AS r
  FROM events
), rho_ AS (
  SELECT event_type, day, bucket,
         CASE WHEN r = 0 THEN 55 ELSE 55 - length(bin(r)) END AS rho
  FROM buckets
), regs_day AS (
  SELECT event_type, day, bucket, max(rho) AS m_reg FROM rho_ GROUP BY 1, 2, 3
), days AS (
  SELECT DISTINCT event_type, day AS win_end FROM regs_day
), win_regs AS (
  SELECT d.event_type, d.win_end, r.bucket, max(r.m_reg) AS m_reg
  FROM regs_day r JOIN days d
    ON r.event_type = d.event_type
   AND r.day <= d.win_end AND r.day > d.win_end - {HLL_WIN_DAYS}
  GROUP BY 1, 2, 3
), n_days AS (
  SELECT d.event_type, d.win_end, count(DISTINCT r.day)::INT AS n_days_in_win
  FROM (SELECT DISTINCT event_type, day FROM regs_day) r JOIN days d
    ON r.event_type = d.event_type
   AND r.day <= d.win_end AND r.day > d.win_end - {HLL_WIN_DAYS}
  GROUP BY 1, 2
), exact AS (
  SELECT d.event_type, d.win_end, count(DISTINCT e.user_id) AS n_distinct_exact
  FROM (SELECT event_type, ts::DATE AS day, user_id FROM events) e JOIN days d
    ON e.event_type = d.event_type
   AND e.day <= d.win_end AND e.day > d.win_end - {HLL_WIN_DAYS}
  GROUP BY 1, 2
), agg AS (
  SELECT event_type, win_end,
         sum(1::BIGINT << (55 - m_reg))::BIGINT AS z_present,
         count(*) AS n_present
  FROM win_regs GROUP BY 1, 2
)
SELECT a.event_type, a.win_end, n.n_days_in_win, x.n_distinct_exact,
       round(
         CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M}) * pow(2.0, 55)
                   / (a.z_present + ({HLL_M} - a.n_present) * (1::BIGINT << 55))::DOUBLE
                   <= {2.5 * HLL_M}
               AND ({HLL_M} - a.n_present) > 0
              THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - a.n_present)::DOUBLE)
              ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}) * pow(2.0, 55)
                   / (a.z_present + ({HLL_M} - a.n_present) * (1::BIGINT << 55))::DOUBLE
         END, 4) AS hll_estimate
FROM agg a
JOIN n_days n ON a.event_type = n.event_type AND a.win_end = n.win_end
JOIN exact x ON a.event_type = x.event_type AND a.win_end = x.win_end
"""


QUERIES = {
    "sketch_kmv_distinct": sketch_kmv_distinct,
    "quantiles_event_value": quantiles_event_value,
    "sketch_bloom_membership": sketch_bloom_membership,
    "sketch_cms_heavy_hitters": sketch_cms_heavy_hitters,
    "sketch_hll_distinct": sketch_hll_distinct,
    "sketch_hll_daily_merge": sketch_hll_daily_merge,
    "sketch_theta_setops": sketch_theta_setops,
    "sketch_bottomk_daily_merge": sketch_bottomk_daily_merge,
    "sketch_hll_sliding_window": sketch_hll_sliding_window,
}

ORACLES = {
    "sketch_kmv_distinct": KMV_SQL,
    "quantiles_event_value": QUANTILES_SQL,
    "sketch_bloom_membership": _bloom_sql(),
    "sketch_cms_heavy_hitters": _cms_sql(),
    "sketch_hll_distinct": _hll_sql(),
    "sketch_hll_daily_merge": _hll_merge_sql(),
    "sketch_theta_setops": THETA_SETOPS_SQL,
    "sketch_bottomk_daily_merge": BOTTOMK_MERGE_SQL,
    "sketch_hll_sliding_window": _hll_sliding_sql(),
}
