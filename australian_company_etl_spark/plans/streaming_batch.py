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
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
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
        F.round(F.sum("value"), 2).alias("sum_value"),
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
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(us) AS session_start_us,
       max(us) AS session_end_us,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


QUERIES = {
    "events_tumbling_agg": events_tumbling_agg,
    "events_sessionize": events_sessionize,
}

ORACLES = {
    "events_tumbling_agg": TUMBLING_SQL,
    "events_sessionize": SESSIONIZE_SQL,
}
