"""Group C — data-quality checks (reference t4, scripts/run_quality_checks.py)."""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from australian_company_etl_spark.operators.quality import (
    duplicate_keys,
    null_empty_counts,
    row_counts,
    value_distribution,
)
from australian_company_etl_spark.sources.registry import load_tables, table_path

COUNT_TABLES = ["customer", "orders", "lineitem", "documents"]

SMALL_FILE_BYTES = 128 * 1024 * 1024  # files below one HDFS-ish block are "small"


def quality_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — per-table row counts (run_quality_checks.py:46-52)."""
    return row_counts(load_tables(spark, sf_dir, COUNT_TABLES))


ROW_COUNTS_SQL = """
SELECT 'customer' AS table_name, count(*) AS n_rows FROM customer
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'documents', count(*) FROM documents
"""


def quality_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — NULL/empty counts on critical columns (run_quality_checks.py:54-62)."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "documents"])
    return null_empty_counts(
        [
            ("customer", t["customer"], "c_name"),
            ("orders", t["orders"], "o_orderstatus"),
            ("documents", t["documents"], "text"),
            ("documents", t["documents"], "lang"),
        ]
    )


# coalesce mirrors the Spark side's empty-table fix (operators/quality.py):
# sum() over ZERO rows is NULL in both engines, and a zero-row landed batch
# must report 0 — the empty-corpus sweep caught the oracle missing the
# coalesce the Spark side gained in round 7 (one-sided fix, gate-blind on
# the non-empty test corpora)
NULL_COUNTS_SQL = """
SELECT 'customer' AS table_name, 'c_name' AS column_name,
       coalesce(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END), 0)::BIGINT AS n_null,
       coalesce(sum(CASE WHEN c_name IS NOT NULL AND trim(c_name) = '' THEN 1 ELSE 0 END), 0)::BIGINT AS n_empty
FROM customer
UNION ALL
SELECT 'orders', 'o_orderstatus',
       coalesce(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END), 0)::BIGINT,
       coalesce(sum(CASE WHEN o_orderstatus IS NOT NULL AND trim(o_orderstatus) = '' THEN 1 ELSE 0 END), 0)::BIGINT
FROM orders
UNION ALL
SELECT 'documents', 'text',
       coalesce(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0)::BIGINT,
       coalesce(sum(CASE WHEN text IS NOT NULL AND trim(text) = '' THEN 1 ELSE 0 END), 0)::BIGINT
FROM documents
UNION ALL
SELECT 'documents', 'lang',
       coalesce(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END), 0)::BIGINT,
       coalesce(sum(CASE WHEN lang IS NOT NULL AND trim(lang) = '' THEN 1 ELSE 0 END), 0)::BIGINT
FROM documents
"""


def quality_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — duplicate-key detection (≈ dup ABNs, run_quality_checks.py:81-98)."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    return duplicate_keys(orders, "o_custkey")


DUP_KEYS_SQL = """
SELECT o_custkey, count(*) AS n
FROM orders GROUP BY o_custkey HAVING count(*) > 1
"""


def quality_conf_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — value-distribution group-by (≈ merged_confidence histogram,
    run_quality_checks.py:64-78) over event values bucketed by 10.

    The bucket is BIGINT, not INT (round-9 extreme-value sweep): an INT32
    bucket silently wraps in Spark's non-ANSI cast and hard-errors in the
    oracle/ANSI the moment |value| exceeds ~2.1e9 — a histogram must
    absorb any input magnitude its double column can carry."""
    events = load_tables(spark, sf_dir, ["events"])["events"]
    bucket = (F.floor(F.col("value") / 10) * 10).cast("bigint")
    return value_distribution(events, bucket, "value_bucket").orderBy("value_bucket")


CONF_DIST_SQL = """
SELECT (floor(value / 10) * 10)::BIGINT AS value_bucket, count(*) AS n
FROM events GROUP BY 1 ORDER BY 1
"""


def quality_table_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — table-maintenance health report: the Spark analog of the
    reference's VACUUM/index verification (run_quality_checks.py:37-116).
    Postgres bloat/index health maps to file-layout health on a data lake:
    per table — file count, total/min/max file bytes, small-file count (the
    classic 100 TB scan killer), plus data-side row count and scan-partition
    skew (floor(100·max/avg rows per input split)).

    File stats come from the filesystem listing: catalog/FS metadata,
    driver-side by design — every table-maintenance tool (OPTIMIZE, VACUUM)
    starts from the file manifest, not a data scan. Row and partition stats
    are computed distributed (one tiny groupBy per table over
    spark_partition_id). No DuckDB twin: file-layout metadata is invisible
    to the oracle's table views, so the driver records the rows-only check;
    tests/test_operators.py checks the numbers against os.stat ground truth.
    """
    import os

    file_rows = []
    for name in COUNT_TABLES:
        p = table_path(sf_dir, name)
        if os.path.isdir(p):
            paths = [
                os.path.join(root, f)
                for root, _, files in os.walk(p)
                for f in files
                if f.endswith(".parquet")
            ]
        else:
            paths = [p]
        sizes = [os.stat(f).st_size for f in paths]
        file_rows.append(
            (
                name,
                len(sizes),
                sum(sizes),
                min(sizes),
                max(sizes),
                sum(1 for s in sizes if s < SMALL_FILE_BYTES),
            )
        )
    meta = spark.createDataFrame(
        file_rows,
        "table_name string, n_files long, total_bytes long, "
        "min_file_bytes long, max_file_bytes long, small_files long",
    ).select(
        "table_name",
        F.expr(
            "stack(5,"
            " 'n_files', n_files,"
            " 'total_bytes', total_bytes,"
            " 'min_file_bytes', min_file_bytes,"
            " 'max_file_bytes', max_file_bytes,"
            " 'small_files', small_files) AS (metric, value)"
        ),
    )

    t = load_tables(spark, sf_dir, COUNT_TABLES)
    data_parts = []
    for name in COUNT_TABLES:
        per_part = (
            t[name]
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .agg(F.count("*").alias("c"))
            .agg(
                F.sum("c").alias("n_rows"),
                F.count("*").alias("n_scan_partitions"),
                F.max("c").alias("max_partition_rows"),
            )
            .withColumn("table_name", F.lit(name))
            .withColumn(
                "skew_pct",
                F.floor(
                    100 * F.col("max_partition_rows") * F.col("n_scan_partitions")
                    / F.col("n_rows")
                ),
            )
        )
        data_parts.append(
            per_part.select(
                "table_name",
                F.expr(
                    "stack(4,"
                    " 'n_rows', n_rows,"
                    " 'n_scan_partitions', CAST(n_scan_partitions AS BIGINT),"
                    " 'max_partition_rows', max_partition_rows,"
                    " 'skew_pct', skew_pct) AS (metric, value)"
                ),
            )
        )
    out = meta
    for d in data_parts:
        out = out.unionByName(d)
    return out.select(
        "table_name", "metric", F.col("value").cast("bigint").alias("value")
    ).orderBy("table_name", "metric")




# ── C7: exact column profile (ANALYZE TABLE statistics) ─────────────────────

_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "dbl"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _str_spark(col, kind: str):
    """Stringify an already-aggregated native min/max (NEVER aggregate the
    string form — lexicographic min('99993.10') beats min('100279.40'))."""
    if kind == "dbl":
        return F.round(col, 2).cast("decimal(18,2)").cast("string")
    if kind == "ts":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def _str_sql(expr: str, kind: str) -> str:
    if kind == "dbl":
        return f"round({expr}, 2)::DECIMAL(18,2)::VARCHAR"
    if kind == "ts":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
    return f"({expr})::VARCHAR"


def quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 — the ANALYZE TABLE statistics pass over orders: per column, row
    count, null count, exact distinct count, stringified min/max (doubles
    via DECIMAL(18,2) and timestamps via a fixed format so the rendering
    is engine-identical). These are the stats a cost-based optimizer (or a
    data catalog) keeps per column.

    Scale (r13, VERDICT r12 item 8): one aggregate PER COLUMN, unioned —
    NOT one aggregate with six exact count(DISTINCT)s, which Spark plans
    through an Expand that multiplies every scanned row ×|cols| through a
    single hash aggregate (the r12 plan dump's Expand node). Each branch
    prunes its scan to one column and plans the single distinct as the
    ordinary two-phase partial aggregate; branches run as independent
    parallel jobs over the same file set. Interleaved sf0.1 A/B:
    4.15 → 1.19 s, no Expand in the plan, rows identical (the comparison
    is order-insensitive; the oracle is itself a UNION ALL). At 100 TB
    you swap the exact distincts for M5's HLL registers with the same
    output shape. Min/max/null partials are algebraic and ride each
    branch's pass, exactly like L8's mergeable-partial contract."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    branches = []
    for c, kind in _PROFILE_COLS:
        branches.append(
            orders.agg(
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
                _str_spark(F.min(F.col(c)), kind).alias("min_s"),
                _str_spark(F.max(F.col(c)), kind).alias("max_s"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                "min_s",
                "max_s",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


def _profile_sql() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,"
            f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,"
            f" count(DISTINCT {c}) AS n_distinct,"
            f" {_str_sql(f'min({c})', kind)} AS min_s,"
            f" {_str_sql(f'max({c})', kind)} AS max_s FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


K_ANON = 5  # minimum group size for a quasi-identifier combo to be safe
# Demo default only — a salt is only a salt if it is secret; production loads
# it from a secret store and rotates per release (see C9 docstring). The env
# override is read at import so the Spark plan and the oracle SQL (both built
# from this constant) stay in agreement. The constant is interpolated into
# the oracle's SQL literal, so the charset is restricted: a quote or SQL
# metacharacter in the salt would break the oracle (or silently diverge it
# from the Spark twin, which passes the salt safely via F.lit).
def _read_salt() -> str:
    salt = os.environ.get("SPARK_GRAFT_PSEUDO_SALT", "corpus-release-2026")
    if not re.fullmatch(r"[A-Za-z0-9_.:-]{1,128}", salt):
        raise ValueError(
            "SPARK_GRAFT_PSEUDO_SALT must match [A-Za-z0-9_.:-]{1,128}: salts are "
            "embedded in the oracle SQL literal and must stay metacharacter-free"
        )
    return salt


PSEUDO_SALT = _read_salt()


def quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 — declarative data-contract validation (the dbt-tests /
    Deequ-style gate the reference runs by hand in run_quality_checks.py):
    each rule counts its violations, the report is (check, n_violations).

    Rules: referential integrity (orders→customer, lineitem→orders, as
    LEFT ANTI joins — the scalable FK check, no row explosion), domain
    bounds (non-positive quantity/price, discount outside [0, 0.5]).

    Scale: each anti join shuffles on its FK (AQE-coalesced); the three
    scalar rules fold into ONE lineitem scan via conditional counts. The
    three 1-row aggregates combine with broadcast cross joins and `stack`
    unpivots — fully declarative, nothing collected on the driver. At
    100 TB this whole report is two anti joins + one scan."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    oo = (
        t["orders"]
        .join(t["customer"].select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti")
        .agg(F.count("*").alias("fk_orders_customer"))
    )
    ol = (
        t["lineitem"]
        .join(t["orders"].select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti")
        .agg(F.count("*").alias("fk_lineitem_orders"))
    )
    # count(when(cond, 1)) — count never returns NULL, so a ZERO-row
    # lineitem (an empty landed batch) reports 0 violations like the
    # oracle's `count(*) FILTER`; the previous sum(when/otherwise) form
    # returned NULL over empty input (empty-corpus sweep finding)
    li = t["lineitem"].agg(
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("nonpos_qty"),
        F.count(F.when(F.col("l_extendedprice") <= 0, 1)).alias("nonpos_price"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1)
        ).alias("discount_out_of_range"),
    )
    return (
        oo.crossJoin(F.broadcast(ol))
        .crossJoin(F.broadcast(li))
        .select(
            F.expr(
                "stack(5,"
                " 'fk_orders_customer', fk_orders_customer,"
                " 'fk_lineitem_orders', fk_lineitem_orders,"
                " 'nonpositive_quantity', nonpos_qty,"
                " 'nonpositive_price', nonpos_price,"
                " 'discount_out_of_range', discount_out_of_range) AS (check, n_violations)"
            )
        )
        .select("check", F.col("n_violations").cast("bigint").alias("n_violations"))
    )


CONSTRAINT_SQL = """
SELECT 'fk_orders_customer' AS check, count(*)::BIGINT AS n_violations
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'fk_lineitem_orders', count(*)::BIGINT
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'nonpositive_quantity', coalesce(count(*) FILTER (WHERE l_quantity <= 0), 0)::BIGINT FROM lineitem
UNION ALL
SELECT 'nonpositive_price', coalesce(count(*) FILTER (WHERE l_extendedprice <= 0), 0)::BIGINT FROM lineitem
UNION ALL
SELECT 'discount_out_of_range', coalesce(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5), 0)::BIGINT FROM lineitem
"""


def privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 — keyed pseudonymization of the event log's user identifier:
    user_pseudo = 60-bit hash of (salt ‖ user_id). Stable within a release
    (joins/sessionization still work), unlinkable across releases when the
    salt rotates, and the raw id never leaves the projection — the minimum
    viable PII treatment before an event log feeds a training corpus
    (complements H5, which scrubs PII inside free text).

    The salt here is a source-committed demo constant, so the
    unlinkability property only holds against parties without repo
    access; a production deployment must load the salt from a secret
    store (env var / KMS) — a salt is only a salt if it is secret — and
    rotate it per release. Override via SPARK_GRAFT_PSEUDO_SALT.

    Scale: a pure per-row projection — no shuffle, no UDF."""
    from australian_company_etl_spark.functions.textfns import phash_spark

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.select(
        "event_id",
        phash_spark(F.concat(F.lit(PSEUDO_SALT + ":"), F.col("user_id"))).alias(
            "user_pseudo"
        ),
        "event_type",
    )


def _pseudonymize_sql() -> str:
    from australian_company_etl_spark.functions.textfns import phash_sql

    return f"""
SELECT event_id,
       {phash_sql(f"'{PSEUDO_SALT}:' || user_id")} AS user_pseudo,
       event_type
FROM events
"""


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 — k-anonymity audit over quasi-identifiers: every
    (nation, market-segment) combination that fewer than K_ANON customers
    share is a re-identification risk the release must generalize or
    suppress. The standard pre-publication audit for any per-user table.

    Scale: one map-side-combined groupBy on the quasi-identifier tuple."""
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("group_size").cast("int").alias("group_size"),
            (F.col("group_size") >= K_ANON).alias("k_ok"),
        )
    )


K_ANONYMITY_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       count(*)::INT AS group_size,
       count(*) >= {K_ANON} AS k_ok
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


PSI_BIN_WIDTH = 64  # n_chars bin width; corpus docs span ~50-560 chars


def quality_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 — distribution-drift gate: Population Stability Index between a
    reference cohort and a candidate cohort of the corpus, over binned
    document length. PSI = Σ (p_i − q_i)·ln(p_i/q_i); the standard release
    gate before a new crawl batch joins a training mix (PSI > 0.2 ⇒ the
    batch's length profile shifted enough to re-audit upstream filters).

    Cohorts are the deterministic hash halves of doc_id (same mechanism as
    N2's split), so the check is reproducible across engines and runs. Bin
    counts get add-one smoothing so empty bins never divide by zero and the
    index stays finite — deterministic, unlike epsilon-clamping conventions.

    Scale: one map-side-combined groupBy on (bin, cohort) — the profile is
    O(bins) rows no matter the corpus size; at 100 TB the same one-pass
    conditional-count shape holds. Reference parity: run_quality_checks.py
    profiles fixed-bucket distributions (:64-78); this is the two-cohort
    comparison version.
    """
    from australian_company_etl_spark.functions.textfns import phash_spark

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    cohort = phash_spark(F.col("doc_id").cast("string")) % 2
    binned = docs.select(
        F.expr(f"n_chars div {PSI_BIN_WIDTH}").alias("bin_id"),
        cohort.alias("cohort"),
    )
    counts = binned.groupBy("bin_id").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("n_ref_raw"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("n_cur_raw"),
    )
    # add-one smoothing; totals include one count per observed bin. Totals
    # come from an unpartitioned window over the ALREADY-aggregated frame —
    # O(bins) rows funneled to one task, so the corpus is scanned once (a
    # totals re-aggregate would re-read the scan subtree; asserted in
    # test_scale_plan).
    from pyspark.sql import Window

    wall = Window.partitionBy()
    tot_ref = (F.sum("n_ref_raw").over(wall) + F.count("*").over(wall)).alias("tot_ref")
    tot_cur = (F.sum("n_cur_raw").over(wall) + F.count("*").over(wall)).alias("tot_cur")
    p = (F.col("n_ref_raw") + 1).cast("double") / F.col("tot_ref")
    q = (F.col("n_cur_raw") + 1).cast("double") / F.col("tot_cur")
    return (
        counts.select("bin_id", "n_ref_raw", "n_cur_raw", tot_ref, tot_cur)
        .select(
            "bin_id",
            F.col("n_ref_raw").cast("bigint").alias("n_ref"),
            F.col("n_cur_raw").cast("bigint").alias("n_cur"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


def _drift_psi_sql() -> str:
    from australian_company_etl_spark.functions.textfns import phash_sql

    return f"""
WITH counts AS (
  SELECT n_chars // {PSI_BIN_WIDTH} AS bin_id,
         count(*) FILTER (WHERE {phash_sql("doc_id::VARCHAR")} % 2 = 0) AS n_ref_raw,
         count(*) FILTER (WHERE {phash_sql("doc_id::VARCHAR")} % 2 = 1) AS n_cur_raw
  FROM documents GROUP BY 1
),
tot AS (
  SELECT bin_id, n_ref_raw, n_cur_raw,
         sum(n_ref_raw) OVER () + count(*) OVER () AS tot_ref,
         sum(n_cur_raw) OVER () + count(*) OVER () AS tot_cur
  FROM counts
)
SELECT bin_id,
       n_ref_raw::BIGINT AS n_ref,
       n_cur_raw::BIGINT AS n_cur,
       round(((n_ref_raw + 1)::DOUBLE / tot_ref - (n_cur_raw + 1)::DOUBLE / tot_cur)
             * ln(((n_ref_raw + 1)::DOUBLE / tot_ref) / ((n_cur_raw + 1)::DOUBLE / tot_cur)),
             6) AS psi_term
FROM tot
"""


# v1 snapshot = events strictly before this instant. Mid-day before the
# corpus's last half-day so the report exercises a real class mix on the
# bench data (users quiet after the cutoff -> unchanged, active ->
# changed); the 'added' / exact-instant branches are pinned by constructed
# rows in tests/test_boundary_new_ops.py.
DIFF_CUTOFF = "2024-01-30 12:00:00"


def quality_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 — snapshot diff across a data refresh (data-CI's core check):
    build the same per-user derived table from the OLD snapshot (events
    before a cutoff) and the NEW one (all events), then classify every key
    as added / changed / unchanged with exact-integer content comparison
    (event count + cent-exact value sum). The report a pipeline posts on
    every refresh so silent upstream rewrites are caught before training.

    Scale: two map-side-combined aggregates over one scan lineage + one
    full outer equi-join on the key; the diff classification is a pure
    projection. 'removed' is structurally impossible for an append-only
    log (v1 ⊆ v2) but the branch is expressed so mutable sources report
    it."""
    from australian_company_etl_spark.functions.exactmath import D38, cents

    ev = load_tables(spark, sf_dir, ["events"])["events"]

    def snap(df):
        # sum in DECIMAL(38,0), not BIGINT: the sum is only ever compared
        # for within-engine equality (never output), and a total-skew
        # corpus (all events on one user × extreme magnitudes) overflows a
        # BIGINT sum — Spark ANSI raises where DuckDB silently promotes to
        # HUGEINT (caught by the composed
        # extreme_values+same_timestamp+single_user regime, round 10);
        # both engines are exact to 1e38 this way, so the changed/unchanged
        # classification stays identical with no envelope needed
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(cents("value").cast(D38)).alias("sum_cents"),
        )

    v1 = snap(ev.filter(F.col("ts") < F.lit(DIFF_CUTOFF).cast("timestamp")))
    v2 = snap(ev)
    j = v1.alias("a").join(
        v2.alias("b"),
        F.col("a.user_id") == F.col("b.user_id"),
        "full_outer",
    )
    change = (
        F.when(F.col("a.user_id").isNull(), "added")
        .when(F.col("b.user_id").isNull(), "removed")
        .when(
            (F.col("a.n_events") == F.col("b.n_events"))
            & (F.col("a.sum_cents") == F.col("b.sum_cents")),
            "unchanged",
        )
        .otherwise("changed")
    )
    return (
        j.select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count("*").alias("n_keys"))
    )


SNAPSHOT_DIFF_SQL = f"""
WITH v1 AS (
  SELECT user_id, count(*) AS n_events,
         sum(CAST(round((value) * 100) AS BIGINT)) AS sum_cents
  FROM events WHERE ts < TIMESTAMP '{DIFF_CUTOFF}'
  GROUP BY 1
),
v2 AS (
  SELECT user_id, count(*) AS n_events,
         sum(CAST(round((value) * 100) AS BIGINT)) AS sum_cents
  FROM events GROUP BY 1
)
SELECT CASE WHEN a.user_id IS NULL THEN 'added'
            WHEN b.user_id IS NULL THEN 'removed'
            WHEN a.n_events = b.n_events AND a.sum_cents = b.sum_cents
              THEN 'unchanged'
            ELSE 'changed' END AS change_type,
       count(*) AS n_keys
FROM v1 a FULL OUTER JOIN v2 b ON a.user_id = b.user_id
GROUP BY 1
"""


QUERIES = {
    "quality_row_counts": quality_row_counts,
    "quality_table_health": quality_table_health,
    "quality_null_counts": quality_null_counts,
    "quality_dup_keys": quality_dup_keys,
    "quality_conf_distribution": quality_conf_distribution,
    "quality_column_profile": quality_column_profile,
    "quality_constraint_checks": quality_constraint_checks,
    "privacy_pseudonymize": privacy_pseudonymize,
    "privacy_k_anonymity": privacy_k_anonymity,
    "quality_drift_psi": quality_drift_psi,
    "quality_snapshot_diff": quality_snapshot_diff,
}

ORACLES = {
    "quality_row_counts": ROW_COUNTS_SQL,
    "quality_null_counts": NULL_COUNTS_SQL,
    "quality_dup_keys": DUP_KEYS_SQL,
    "quality_conf_distribution": CONF_DIST_SQL,
    "quality_column_profile": _profile_sql(),
    "quality_constraint_checks": CONSTRAINT_SQL,
    "privacy_pseudonymize": _pseudonymize_sql(),
    "privacy_k_anonymity": K_ANONYMITY_SQL,
    "quality_drift_psi": _drift_psi_sql(),
    "quality_snapshot_diff": SNAPSHOT_DIFF_SQL,
}
