"""Group J (batch twins) — event-time analytics over the ingest log.

- J1 `events_tumbling_agg` — 1-hour tumbling-window counts/sums per
  event_type. Batch twin of the Structured Streaming aggregation in
  `australian_company_etl_spark/streaming/pipeline.py`; the reference's
  ingest accounting (processed-file counts, extract_commoncrawl.py:89-110)
  is the same rollup without event-time.
- J2 `events_sessionize` — gap-based sessionization (30-minute gap) via
  lag + running-sum of session-start flags.

Scale: J1 is one shuffle on (window, event_type) with map-side partial
aggregation. J2 is one shuffle on user_id (the window partition key); at
100 TB both keys are high-cardinality and AQE coalesces the output. Session
timestamps are compared as epoch-micros BIGINTs — exact, no format drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from australian_company_etl_spark.functions.exactmath import sum_cents, sum_cents_sql
from australian_company_etl_spark.sources.registry import load_tables

SESSION_GAP_US = 30 * 60 * 1_000_000


def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — 1h tumbling window x event_type: count + sum(value)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            sum_cents("value").alias("sum_value"),
        )
    )


TUMBLING_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       {sum_cents_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — 30-min-gap sessionization per user via lag + cumsum."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us).over(w)
    new_session = F.when(prev.isNull() | ((us - prev) > SESSION_GAP_US), 1).otherwise(0)
    sess = ev.select(
        "user_id",
        "value",
        us.alias("us"),
        F.sum(new_session).over(w).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        sum_cents("value").alias("sum_value"),
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, value, us,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(us) AS session_start_us,
       max(us) AS session_end_us,
       count(*) AS n_events,
       {sum_cents_sql('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 — NATIVE session windows: `F.session_window(ts, gap)` merges
    per-key events whose [t, t+gap) windows overlap, entirely inside one
    aggregation operator — the API whose streaming twin gets incremental
    state + watermark eviction for free, where J2's lag+cumsum form is
    batch-only. Boundary semantics (verified empirically): session_window
    MERGES events exactly gap apart — each event spans [t, t+gap) and a
    next event at t+gap overlaps-or-touches, so an exact-gap pair stays
    one session, same as J2's `> gap` rule; the window end is
    last_event + gap, not last_event.

    Scale: one shuffle on user_id; Spark merges sessions inside the
    aggregation (no window-function sort pass over the whole partition
    history as in J2) — and the identical plan runs under readStream with
    a watermark."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), sum_cents("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


SESSION_NATIVE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, value, us,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id,
       min(us) AS session_start_us,
       max(us) + {SESSION_GAP_US} AS session_end_us,
       count(*) AS n_events,
       {sum_cents_sql('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15 — first-order behavior model: the event-type transition matrix.
    Per user the event stream is ordered and each consecutive
    (prev → next) pair counted; probabilities are exact integer ppm
    ((n·10⁶) div total) so the matrix is bit-identical across engines —
    the input for session simulation, anomaly scoring (improbable
    transitions), and funnel design.

    Scale: one shuffle on user_id for the lag window, then a
    map-side-combined groupBy on the (prev, next) pair — K² rows out.
    The per-prev totals join is a broadcast (K distinct types)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n_transitions").alias("total"))
    return pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.expr("(n_transitions * 1000000) div total").alias("p_ppm"),
    )


MARKOV_SQL = """
WITH pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
  FROM (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
totals AS (SELECT prev_type, sum(n_transitions) AS total FROM pairs GROUP BY prev_type)
SELECT p.prev_type, p.next_type, p.n_transitions,
       ((p.n_transitions * 1000000) // t.total)::BIGINT AS p_ppm
FROM pairs p JOIN totals t USING (prev_type)
"""


# ── J5: SCD type-2 state history from the event log ─────────────────────────


def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — slowly-changing-dimension (type 2) compaction of the event log:
    per user, consecutive runs of the same event_type collapse to one state
    interval [valid_from_us, valid_to_us) with an is_current flag on the
    open interval. This is the CDC-merge shape the reference's upsert ledger
    (extract_abr.py:57-66) would need once history must be kept, not
    overwritten.

    Scale: one shuffle on user_id; both windows (change detection, interval
    close) reuse the same partitioning+sort, so Catalyst plans a single
    exchange + sort. At 100 TB the state table partitions by the entity key
    exactly like this.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    rows = ev.select("user_id", "event_id", F.col("event_type").alias("state"), us.alias("us"))
    changed = rows.withColumn("prev_state", F.lag("state").over(w)).filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return changed.select(
        "user_id",
        "state",
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w2).alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


SCD2_SQL = """
WITH rows_ AS (
  SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM events
), changed AS (
  SELECT user_id, event_id, state, us FROM rows_
  WHERE prev_state IS NULL OR prev_state <> state
)
SELECT user_id, state,
       us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
       (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL) AS is_current
FROM changed
"""


# ── J6: funnel conversion (signup → purchase) ───────────────────────────────


def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — ordered funnel per user: first signup, first purchase at-or-
    after that signup, conversion flag and whole-second latency (exact
    integer micros div).

    Scale (r13 one-pass rewrite, VERDICT r12 item 7 / guide §2.4): ONE
    scan and ONE user-keyed aggregate — the first step is a conditional
    min and the dependent step is array_min(filter(collected purchase
    times, x ≥ signup)): "earliest qualifying at-or-after" computed from
    the per-user purchase multiset instead of a second filtered scan +
    join. The collected array is O(purchases per user), partial-merged
    map-side; the old shape paid two scans, two aggregates and a join.
    Interleaved sf0.1 A/B: 0.62 → 0.39 s, output identical (a user with
    no signup keeps NULL signup_us: the filter lambda's NULL comparison
    keeps nothing and array_min([]) is NULL — exactly the old join's
    dropped-row NULL).
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    rows = ev.select("user_id", F.col("event_type"), us.alias("us"))
    agg = rows.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias("signup_us"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).alias("purch"),
    )
    purchase_us = F.array_min(F.filter("purch", lambda x: x >= F.col("signup_us")))
    return agg.select(
        "user_id", "signup_us", purchase_us.alias("purchase_us")
    ).select(
        "user_id",
        "signup_us",
        "purchase_us",
        F.col("purchase_us").isNotNull().alias("converted"),
        F.expr("(purchase_us - signup_us) div 1000000").alias("secs_to_convert"),
    )


FUNNEL_SQL = """
WITH fs AS (
  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS signup_us
  FROM events GROUP BY user_id
), conv AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN fs USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fs.signup_us
  GROUP BY e.user_id
)
SELECT fs.user_id, fs.signup_us, conv.purchase_us,
       (conv.purchase_us IS NOT NULL) AS converted,
       (conv.purchase_us - fs.signup_us) // 1000000 AS secs_to_convert
FROM fs LEFT JOIN conv USING (user_id)
"""


# ── J7: skew-safe exact distinct ────────────────────────────────────────────


def events_distinct_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — exact distinct-user count per event_type via explicit two-phase
    dedup: phase 1 dedups (event_type, user_id) pairs with map-side partial
    aggregation spread across all partitions, phase 2 counts the deduped
    pairs. With a handful of hot group keys (5 event types here; true of
    any low-cardinality dimension at 100 TB), a naive count(DISTINCT x)
    funnels each key's entire value stream through one reducer — the
    two-phase shape is the standard skew-safe rewrite and what AQE's
    skew mitigation cannot do for you (it can't split an agg key).
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    pairs = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    return pairs.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum("n").alias("n_events"),
    )


DISTINCT_SKEWSAFE_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events
GROUP BY event_type
"""


# ── J9: weekly retention cohorts ────────────────────────────────────────────

WEEK_US = 7 * 86_400 * 1_000_000


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — weekly retention matrix: cohort = each user's first active week
    (epoch-week by exact integer division of micros), cell (cohort_week,
    week_offset) = distinct users from that cohort active offset weeks
    later. The product-analytics twin of the reference's per-run ingest
    accounting (extract_commoncrawl.py:89-110) once runs become user weeks.

    Scale: the distinct (user_id, week) pre-aggregation is the skew guard —
    raw events collapse to at most users×weeks rows with map-side combine
    before anything else shuffles (same two-phase shape as J7). The
    cohort min rides the user_id partitioning of that dedup, the join back
    is user_id⋈user_id on the same key, and the final (cohort, offset)
    aggregate is a shuffle over a ~|weeks|² -sized result. No count
    (DISTINCT ...) ever funnels one hot key through a single reducer."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    active = (
        ev.select("user_id", F.expr(f"unix_micros(ts) div {WEEK_US}").alias("week"))
        .distinct()
    )
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
    )


RETENTION_SQL = f"""
WITH active AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM active GROUP BY user_id
)
SELECT cohort.cohort_week, active.week - cohort.cohort_week AS week_offset,
       count(*) AS n_users
FROM active JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


# ── J10: exact z-score outlier flags ────────────────────────────────────────

# Per-row exactness envelope shared by the J10/J16 exact-moments plans
# (ADVICE r09): |value| ≤ $3e9 ⇔ |v_centi| ≤ 3e11 keeps Σv² within
# DECIMAL(38,0)/HUGEINT at up to 1e15 rows per group (3e11² × 1e15 ≈ 9e37
# < 1e38). Guarding the DOUBLE before the floor/cast means neither engine
# can reach a raw (unmatched) int-overflow error first.
_CENTI_ENV_ABS = 3.0e9


def _centi_guarded(query: str):
    return F.when(
        F.abs(F.col("value")) > F.lit(_CENTI_ENV_ABS),
        F.raise_error(
            F.lit(
                f"{query}: exact-moments envelope exceeded (|value| > 3e9 "
                "would overflow the exact sum-of-squares accumulator) — "
                "rescale the value unit before the exact moments"
            )
        ).cast("bigint"),
    ).otherwise(F.expr("cast(floor(value * 100) as bigint)"))


def _centi_guarded_sql(query: str) -> str:
    return (
        f"CASE WHEN abs(value) > 3e9 THEN error('{query}: exact-moments "
        f"envelope exceeded (|value| > 3e9 would overflow the exact "
        f"sum-of-squares accumulator) - rescale the value unit before the "
        f"exact moments')::BIGINT "
        f"ELSE CAST(floor(value * 100) AS BIGINT) END"
    )


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — per-event |z| > 3 outlier flag against the event_type's own
    value distribution, decided in EXACT integer arithmetic: with v in
    floor-centi-units and per-type (n, s=Σv, ssq=Σv²),

        |z| > 3  ⇔  (v − s/n)² > 9·(n·ssq − s²)/n²  ⇔  (n·v − s)² > 9·(n·ssq − s²)

    so the flag is a pure integer comparison — no engine-specific sqrt/
    division ulps can flip a boundary row (the anomaly-gate analog of the
    reference's value-distribution check, run_quality_checks.py:64-78).
    Spark computes in DECIMAL(38,0), DuckDB in HUGEINT; both exact up to
    ~1e38.

    ENVELOPE (made loud in round 9 — the extreme-value regime sweep): the
    per-row square is promoted to wide arithmetic BEFORE the multiply
    (v_centi² silently wrapped BIGINT past |v| ≈ $9.6e7), and the final
    moment products are guarded by n ≤ 1e15 AND n·max|v_centi| ≤ 1e18
    (⇒ every term ≤ ~2e37, inside both engines' exact range; at money
    magnitudes that is ~1e12 rows per type — the prior documented bound —
    while 1000× the fact rows of a 100 TB corpus stay in range). Outside
    it BOTH engines raise a matched 'exact-moments envelope' error —
    never a silent NULL/wrapped flag. A second, PER-ROW guard refuses
    |value| > $3e9 before the aggregation (ADVICE r09): past that, the
    Σv² accumulator itself can exceed DECIMAL(38,0)/HUGEINT (1e15 rows ×
    (3e11 centi)² ≈ 9e37 is the cap) and would fail with UNMATCHED raw
    overflow errors before the post-aggregate guard ever evaluates —
    both engines now decline loudly, with the marker, at the scan.

    Scale: one map-side-combined aggregate per event_type (5 rows) +
    a broadcast join back — a single pass over the fact table, no window,
    no second shuffle. Population σ (point included) by design."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    rows = ev.select(
        "event_id",
        "event_type",
        _centi_guarded("events_value_outliers").alias("v_centi"),
    )
    d38 = "decimal(38,0)"
    vd = F.col("v_centi").cast(d38)
    stats = rows.groupBy("event_type").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(vd).alias("s"),
        F.sum(vd * vd).alias("ssq"),
        F.max(F.abs(F.col("v_centi"))).cast(d38).alias("m"),
    )
    j = rows.join(F.broadcast(stats), "event_type")
    in_env = (F.col("n") <= F.lit(10**15).cast(d38)) & (
        F.col("n") * F.col("m") <= F.lit(10**18).cast(d38)
    )
    dev = F.col("n") * F.col("v_centi") - F.col("s")
    var9 = F.lit(9).cast(d38) * (F.col("n") * F.col("ssq") - F.col("s") * F.col("s"))
    flag = F.when(
        ~in_env,
        F.raise_error(
            F.lit(
                "events_value_outliers: exact-moments envelope exceeded "
                "(n > 1e15 or n*max|v_centi| > 1e18) — rescale the value "
                "unit or shard the type before the z-test"
            )
        ).cast("boolean"),
    ).otherwise(dev * dev > var9)
    return j.select(
        "event_id",
        "event_type",
        "v_centi",
        flag.alias("is_outlier"),
    )


OUTLIERS_SQL = f"""
WITH rows_ AS (
  SELECT event_id, event_type, {_centi_guarded_sql("events_value_outliers")} AS v_centi FROM events
), stats AS (
  SELECT event_type,
         count(*)::HUGEINT AS n,
         sum(v_centi)::HUGEINT AS s,
         sum(v_centi::HUGEINT * v_centi) AS ssq,
         max(abs(v_centi))::HUGEINT AS m
  FROM rows_ GROUP BY event_type
)
SELECT r.event_id, r.event_type, r.v_centi,
       CASE WHEN n > 1000000000000000::HUGEINT
              OR n * m > 1000000000000000000::HUGEINT
            THEN error('events_value_outliers: exact-moments envelope exceeded (n > 1e15 or n*max|v_centi| > 1e18) — rescale the value unit or shard the type before the z-test')::BOOLEAN
            ELSE (n * r.v_centi - s) * (n * r.v_centi - s) > 9 * (n * ssq - s * s)
       END AS is_outlier
FROM rows_ r JOIN stats USING (event_type)
"""


MAD_K = 4.4478  # 3 × 1.4826 (MAD→σ consistency constant for normal data)


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 — robust outlier detection via Median Absolute Deviation:
    |value − median| > 3·1.4826·MAD per event_type. Unlike the z-score
    (J10), the median/MAD estimators don't move when the outliers
    themselves inflate the mean/σ — the standard robust alternative.

    Determinism: Spark `percentile` and DuckDB `quantile_cont` share the
    rank = p·(n−1) interpolation (proven hash-exact in M2); every
    downstream operand (abs dev, the K·MAD threshold) is scalar arithmetic
    on those identical doubles, so the flag can't flip on an ulp.

    Scale: two stats passes (median, then MAD over deviations), each a
    per-type aggregate whose result is a tiny broadcast dim; the event
    stream is scanned twice but never shuffled on a per-row key. At 100 TB
    swap `percentile` for `percentile_approx`/a mergeable quantile sketch
    — same dataflow."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5D)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5D)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > MAD_K * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round("adev", 6).alias("abs_dev"),
        )
    )


MAD_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type)
SELECT d.event_id, d.event_type, d.value,
       round(d.med, 6) AS med, round(m.mad, 6) AS mad, round(d.adev, 6) AS abs_dev
FROM dev d JOIN mad m USING (event_type)
WHERE d.adev > {MAD_K} * m.mad
"""


def events_corr_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16 — Pearson correlation between event value and hour-of-day per
    event_type (is traffic value time-of-day dependent?), computed the
    numerically-principled way: all six sufficient statistics (n, Σx, Σy,
    Σx², Σy², Σxy) are EXACT integer sums — x = hour ∈ [0,23], y = value
    in floor-centi-units — held as DECIMAL(38,0) in Spark and HUGEINT in
    DuckDB, so there is no accumulation-order float drift; the only float
    ops are the final casts, one multiply, sqrt (correctly rounded), and
    the division — identical expression order in both engines.

    Built-in `corr()` would stream doubles through a partition-order-
    dependent summation — unusable for a cross-engine exact gate; this is
    the same exact-moments discipline as J10's z-score.

    Scale: one map-side-combined aggregate, K rows out."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    d38 = "decimal(38,0)"
    base = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        _centi_guarded("events_corr_value_hour").alias("y"),
    )
    # per-row squares promoted BEFORE the multiply (round-9 extreme-value
    # sweep: y*y in BIGINT silently wraps past |y| ≈ 3e9 in non-ANSI
    # Spark and hard-errors in the oracle), the same loud
    # n ≤ 1e15 / n·max|y| ≤ 1e18 envelope guard as the J10 z-test —
    # every downstream moment product then stays ≤ ~2e37, exact in both
    # engines (x ≤ 23 is bounded by construction, so y dominates) — and
    # the shared per-row |value| ≤ 3e9 scan guard (ADVICE r09) so the Σy²
    # accumulator itself can't overflow ahead of the post-agg guard
    yd = F.col("y").cast(d38)
    xd = F.col("x").cast(d38)
    agg = base.groupBy("event_type").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
        F.max(F.abs(F.col("y"))).cast(d38).alias("m"),
    )
    in_env = (F.col("n") <= F.lit(10**15).cast(d38)) & (
        F.col("n") * F.col("m") <= F.lit(10**18).cast(d38)
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # Zero-variance guard: a degenerate group (constant hour or constant
    # value) must yield NULL in BOTH engines — unguarded, Spark's non-ANSI
    # 0/0 is NULL while DuckDB's IEEE division is inf/nan.
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.when(
            ~in_env,
            F.raise_error(
                F.lit(
                    "events_corr_value_hour: exact-moments envelope exceeded "
                    "(n > 1e15 or n*max|v_centi| > 1e18) — rescale the value "
                    "unit before the exact corr"
                )
            ).cast("double"),
        )
        .when(vx * vy > 0, F.round(num / F.sqrt(vx * vy), 6))
        .alias("pearson_r"),
    )


CORR_SQL = f"""
WITH base AS (
  SELECT event_type,
         hour(ts)::BIGINT AS x,
         {_centi_guarded_sql("events_corr_value_hour")} AS y
  FROM events
),
agg AS (
  SELECT event_type,
         count(*)::HUGEINT AS n,
         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         sum(x::HUGEINT * x) AS sxx, sum(y::HUGEINT * y) AS syy,
         sum(x::HUGEINT * y) AS sxy,
         max(abs(y))::HUGEINT AS m
  FROM base GROUP BY event_type
)
SELECT event_type,
       n::BIGINT AS n,
       CASE WHEN n > 1000000000000000::HUGEINT
              OR n * m > 1000000000000000000::HUGEINT
            THEN error('events_corr_value_hour: exact-moments envelope exceeded (n > 1e15 or n*max|v_centi| > 1e18) — rescale the value unit before the exact corr')::DOUBLE
            WHEN (n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE > 0
            THEN round((n * sxy - sx * sy)::DOUBLE
                       / sqrt((n * sxx - sx * sx)::DOUBLE
                              * (n * syy - sy * sy)::DOUBLE),
                       6)
            ELSE NULL END AS pearson_r
FROM agg
"""


def events_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J17 — ingest freshness / staleness monitor: per event_type, the last
    seen event and how many whole hours it lags the stream's global
    high-water mark. The first page of every pipeline dashboard — a source
    whose staleness grows is a dead upstream. The reference's ledger
    (processed_files timestamps) answers the same question per file.

    Anchoring staleness to the GLOBAL max (not wall clock) keeps the
    result a pure function of the data. Scale: two tiny aggregates; the
    1-row high-water mark broadcasts."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per_type = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.max(F.unix_micros(F.col("ts"))).alias("max_us"),
    )
    hwm = ev.agg(F.max(F.unix_micros(F.col("ts"))).alias("hwm_us"))
    return per_type.crossJoin(F.broadcast(hwm)).select(
        "event_type",
        "n_events",
        F.date_format(F.timestamp_micros(F.col("max_us")), "yyyy-MM-dd HH:mm:ss").alias(
            "last_seen"
        ),
        F.expr("(hwm_us - max_us) div 3600000000").alias("staleness_hours"),
    )


FRESHNESS_SQL = """
WITH per_type AS (
  SELECT event_type, count(*) AS n_events, max(epoch_us(ts)) AS max_us
  FROM events GROUP BY event_type
),
hwm AS (SELECT max(epoch_us(ts)) AS hwm_us FROM events)
SELECT event_type, n_events,
       strftime(make_timestamp(max_us), '%Y-%m-%d %H:%M:%S') AS last_seen,
       ((hwm_us - max_us) // 3600000000)::BIGINT AS staleness_hours
FROM per_type, hwm
"""


def events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J18 — inter-arrival statistics per user: count, median and p90 of
    the gap between consecutive events (whole seconds, exact interpolated
    percentiles — the M2-proven parity pair). The session-gap and
    engagement-cadence evidence that motivates J2's 30-minute threshold.

    Scale: one shuffle on user_id for the lag window; the percentile
    aggregate rides the same partitioning."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", us.alias("us"), F.lag(us).over(w).alias("prev_us"))
        .filter(F.col("prev_us").isNotNull())
        .select("user_id", F.expr("(us - prev_us) div 1000000").alias("gap_s"))
    )
    pct = F.expr("percentile(gap_s, array(0.5D, 0.9D))")
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.round(pct[0], 3).alias("median_gap_s"),
        F.round(pct[1], 3).alias("p90_gap_s"),
    )


GAP_STATS_SQL = """
WITH gaps AS (
  SELECT user_id,
         ((epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000)::BIGINT AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, count(*) AS n_gaps,
       round(quantile_cont(gap_s, 0.5), 3) AS median_gap_s,
       round(quantile_cont(gap_s, 0.9), 3) AS p90_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY user_id
"""


CDC_DELETE_TYPE = "error"  # changelog tombstone: an error event retires the key


def events_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J19 — changelog → snapshot compaction (the CDC/MERGE INTO read
    path): interpreting the event log as a per-user changelog, the current
    snapshot is each user's latest row by (event time, event_id), with a
    tombstone type (`error`) retiring the key entirely. This is the
    batch-compaction twin of J8's foreachBatch upsert sink: replaying the
    full log through this operator must equal the incrementally-merged
    table.

    Scale: latest-row selection runs as `max(struct(ts, id, ...))` — a
    partially-aggregatable agg, NOT a row_number window (which would move
    EVERY changelog row through the exchange and sort each user's full
    history). The partial_max combiner collapses each map task to one row
    per key before the exchange, so shuffle volume is O(keys), the shape a
    lakehouse MERGE compaction job has. Struct max carries no mutable hash
    buffer, so the plan is a SortAggregate (asserted in test_scale_plan) —
    the map-side sort is by grouping key only, over already-combined rows,
    not by event time over raw history.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    s = F.struct(
        us.alias("us"),
        F.col("event_id").alias("event_id"),
        F.col("event_type").alias("event_type"),
        F.col("value").alias("value"),
    )
    return (
        ev.select("user_id", s.alias("s"))
        .groupBy("user_id")
        .agg(F.max("s").alias("s"))
        .filter(F.col("s.event_type") != CDC_DELETE_TYPE)
        .select(
            "user_id",
            F.col("s.us").alias("last_us"),
            F.col("s.event_id").alias("last_event_id"),
            F.col("s.event_type").alias("last_event_type"),
            F.col("s.value").alias("last_value"),
        )
    )


CDC_SNAPSHOT_SQL = f"""
WITH ranked AS (
  SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id,
         event_type AS last_event_type, value AS last_value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, last_us, last_event_id, last_event_type, last_value
FROM ranked
WHERE rn = 1 AND last_event_type <> '{CDC_DELETE_TYPE}'
"""


def events_watermark_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J20 — out-of-orderness audit: treating event_id as arrival order,
    an event is late by (running max of event time over earlier arrivals −
    its own event time). The per-type lateness profile (late fraction, p99
    and max lateness) is exactly the evidence that sizes a streaming job's
    watermark: `withWatermark(ts, p99_late)` bounds state while dropping
    at most 1% of rows. The batch audit every streaming deployment should
    run before choosing its delay threshold.

    Scale: one shuffle on event_type for the running-max window, then the
    aggregate rides the same partitioning. The window is ROWS UNBOUNDED
    PRECEDING — a single forward scan per partition, no re-sort beyond the
    shuffle's own ordering.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_us = F.greatest(
        F.lit(0).cast("bigint"), F.coalesce(F.max(us).over(w), us) - us
    )
    lat = ev.select("event_type", late_us.alias("late_us"))
    pct = F.expr("percentile(late_us div 1000000, 0.99D)")
    return lat.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).alias("n_late"),
        F.round(pct, 3).alias("p99_late_s"),
        F.expr("max(late_us) div 1000000").alias("max_late_s"),
    )


WATERMARK_LAG_SQL = """
WITH lat AS (
  SELECT event_type,
         greatest(0, coalesce(max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                              epoch_us(ts)) - epoch_us(ts)) AS late_us
  FROM events
)
SELECT event_type, count(*) AS n_events,
       coalesce(count(*) FILTER (WHERE late_us > 0), 0)::BIGINT AS n_late,
       round(quantile_cont(late_us // 1000000, 0.99), 3) AS p99_late_s,
       (max(late_us) // 1000000)::BIGINT AS max_late_s
FROM lat
GROUP BY event_type
"""


ATTR_CONVERSION = "purchase"  # the event whose value gets attributed


def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J21 — last-touch revenue attribution: each purchase's value is
    credited to the user's most recent PRECEDING non-purchase event type
    (the touchpoint); purchases with no prior touchpoint credit 'direct'.
    Output: per-touchpoint conversion count and exact-cents revenue — the
    marketing-attribution report, and the within-stream companion of L1's
    as-of join (which aligns two tables; this carries state forward inside
    one ordered stream).

    Scale: one shuffle on user_id; the carry-forward is
    last(..., ignorenulls) over ROWS UNBOUNDED PRECEDING .. -1 — a single
    forward scan per user partition — and the final aggregate is
    map-side-combined over |event types| groups."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != ATTR_CONVERSION, F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    attributed = (
        ev.select("user_id", "ts", "event_id", "event_type", "value")
        .withColumn("touch", touch)
        .filter(F.col("event_type") == ATTR_CONVERSION)
    )
    return (
        attributed.groupBy(F.coalesce("touch", F.lit("direct")).alias("touchpoint"))
        .agg(
            F.count("*").alias("n_conversions"),
            sum_cents("value").alias("sum_value"),
        )
    )


ATTRIBUTION_SQL = f"""
WITH touched AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> '{ATTR_CONVERSION}' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
)
SELECT coalesce(touch, 'direct') AS touchpoint,
       count(*) AS n_conversions,
       {sum_cents_sql('value')} AS sum_value
FROM touched
WHERE event_type = '{ATTR_CONVERSION}'
GROUP BY 1
"""


FUNNEL3_STEPS = ("signup", "click", "purchase")


def events_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J22 — ordered 3-step funnel (signup → click → purchase): per user,
    each step's timestamp is the earliest qualifying event AT OR AFTER the
    previous step's; the report is per-step user counts plus the median
    whole-second end-to-end latency of completers. Generalizes J6's
    two-step conversion to the arbitrary-depth chain product analytics
    needs.

    Scale (r13 one-pass rewrite, VERDICT r12 item 7 / guide §2.4): ONE
    scan of the step-filtered events and ONE user-keyed aggregate — t1 is
    a conditional min, and each dependent step is array_min(filter(
    collected step events, x ≥ prev)) over the per-user multiset, so the
    whole chain costs one shuffle of O(step events per user) instead of
    three scans + three aggregates + two joins with three frames
    persisted simultaneously (that shape also held s1 live long after s2
    materialized — VERDICT r12 item 9, moot here). The counts + median
    reduce the per-user frame in one final 1-row aggregate. Interleaved
    sf0.1 A/B: 1.07 → 0.52 s, output identical (t2/t3 NULL-chaining:
    a NULL prev makes the filter lambda NULL → empty array → NULL min,
    exactly the old inner-join dropout)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    e = ev.select("user_id", "event_type", us.alias("us")).filter(
        F.col("event_type").isin(*FUNNEL3_STEPS)
    )
    agg = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL3_STEPS[0], F.col("us"))).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL3_STEPS[1], F.col("us"))
        ).alias("clk"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL3_STEPS[2], F.col("us"))
        ).alias("pur"),
    )
    t2 = F.array_min(F.filter("clk", lambda x: x >= F.col("t1")))
    t3 = F.array_min(F.filter("pur", lambda x: x >= F.col("t2")))
    per_user = (
        agg.withColumn("t2", t2)
        .withColumn("t3", t3)
        .select("t1", "t2", "t3", F.expr("(t3 - t1) div 1000000").alias("lat_s"))
    )
    return per_user.agg(
        F.count("t1").alias("n_step1"),
        F.count("t2").alias("n_step2"),
        F.count("t3").alias("n_step3"),
        F.round(F.expr("percentile(lat_s, 0.5D)"), 3).alias("median_total_s"),
    )


FUNNEL3_SQL = f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s1 AS (
  SELECT user_id, min(us) AS t1 FROM e
  WHERE event_type = '{FUNNEL3_STEPS[0]}' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.us) AS t2, min(s1.t1) AS t1
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{FUNNEL3_STEPS[1]}' AND e.us >= s1.t1
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.us) AS t3, min(s2.t1) AS t1
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{FUNNEL3_STEPS[2]}' AND e.us >= s2.t2
  GROUP BY 1
)
SELECT (SELECT count(*) FROM s1) AS n_step1,
       (SELECT count(*) FROM s2) AS n_step2,
       (SELECT count(*) FROM s3) AS n_step3,
       (SELECT round(quantile_cont((t3 - t1) // 1000000, 0.5), 3) FROM s3)
         AS median_total_s
"""


def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J23 — peak concurrency via a sweep line: treat each event as a
    half-open activity interval [ts, ts + 30 min) and report, per
    event_type, the maximum number of simultaneously-active intervals —
    the capacity-planning number (peak live sessions) behind autoscaling
    thresholds.

    The sweep is exact and order-independent by construction: +1/−1
    boundary points are NETTED per distinct timestamp before the running
    sum (so an interval ending exactly when another starts never
    double-counts under half-open semantics, and ties cannot reorder the
    peak). One shuffle on event_type; the running max rides the window
    partition. At 100 TB the same sweep runs per (type, day) with
    carried-in open counts — the netted points are O(distinct
    timestamps), already a reduction of the raw log."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    starts = ev.select("event_type", us.alias("t"), F.lit(1).alias("d"))
    ends = ev.select(
        "event_type", (us + F.lit(SESSION_GAP_US)).alias("t"), F.lit(-1).alias("d")
    )
    net = (
        starts.unionByName(ends)
        .groupBy("event_type", "t")
        .agg(F.sum("d").alias("net"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = net.select("event_type", F.sum("net").over(w).alias("running"))
    return running.groupBy("event_type").agg(
        F.max("running").cast("bigint").alias("peak_concurrent")
    )


PEAK_CONCURRENCY_SQL = f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {SESSION_GAP_US}, -1 FROM events
),
net AS (SELECT event_type, t, sum(d) AS net FROM pts GROUP BY 1, 2),
running AS (
  SELECT event_type,
         sum(net) OVER (PARTITION BY event_type ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS running
  FROM net
)
SELECT event_type, CAST(max(running) AS BIGINT) AS peak_concurrent
FROM running GROUP BY 1
"""


QUERIES = {
    "events_tumbling_agg": events_tumbling_agg,
    "events_sessionize": events_sessionize,
    "events_scd2_history": events_scd2_history,
    "events_funnel_steps": events_funnel_steps,
    "events_distinct_skewsafe": events_distinct_skewsafe,
    "events_retention_cohorts": events_retention_cohorts,
    "events_value_outliers": events_value_outliers,
    "events_anomaly_mad": events_anomaly_mad,
    "events_session_window_native": events_session_window_native,
    "events_markov_transitions": events_markov_transitions,
    "events_corr_value_hour": events_corr_value_hour,
    "events_freshness": events_freshness,
    "events_gap_stats": events_gap_stats,
    "events_cdc_snapshot": events_cdc_snapshot,
    "events_watermark_lag_audit": events_watermark_lag_audit,
    "events_attribution_last_touch": events_attribution_last_touch,
    "events_funnel_3step": events_funnel_3step,
    "events_peak_concurrency": events_peak_concurrency,
}

ORACLES = {
    "events_tumbling_agg": TUMBLING_SQL,
    "events_sessionize": SESSIONIZE_SQL,
    "events_scd2_history": SCD2_SQL,
    "events_funnel_steps": FUNNEL_SQL,
    "events_distinct_skewsafe": DISTINCT_SKEWSAFE_SQL,
    "events_retention_cohorts": RETENTION_SQL,
    "events_value_outliers": OUTLIERS_SQL,
    "events_anomaly_mad": MAD_SQL,
    "events_session_window_native": SESSION_NATIVE_SQL,
    "events_markov_transitions": MARKOV_SQL,
    "events_corr_value_hour": CORR_SQL,
    "events_freshness": FRESHNESS_SQL,
    "events_gap_stats": GAP_STATS_SQL,
    "events_cdc_snapshot": CDC_SNAPSHOT_SQL,
    "events_watermark_lag_audit": WATERMARK_LAG_SQL,
    "events_attribution_last_touch": ATTRIBUTION_SQL,
    "events_funnel_3step": FUNNEL3_SQL,
    "events_peak_concurrency": PEAK_CONCURRENCY_SQL,
}
