"""Group E (continued) — the remaining TPC-H plan shapes, E11–E23.

Together with plans/tpch.py this covers all 22 TPC-H query forms; the point
is plan-shape coverage (correlated subqueries, double-EXISTS, scalar-subquery
HAVING, disjunctive predicate pushdown, left-outer distribution, …), adapted
to this schema:

- no `partsupp` table → derived ``ps`` relation from lineitem:
  per (l_partkey, l_suppkey) min unit price as ps_supplycost_micro and
  summed quantity as ps_availqty. The unit price is computed in EXACT
  integer micro-units ((cents * 10000) div qty) — float round() on
  intermediate values is engine-unstable (Spark HALF_UP on the decimal
  expansion vs DuckDB multiply-then-round disagree near .xx5 boundaries),
  and integer money arithmetic removes the problem entirely.
- no phone/comment/container columns → analogous predicates on columns the
  data has (priority for Q13's comment filter, nationkey%10 for Q22's
  country code, p_size for Q17's container).

Determinism across engines: every aggregate that feeds a comparison, rank,
or output is either exact in double (integral sums, counts, min/max) or
rounded in-query on BOTH sides before use, with full-key ORDER BY tie-breaks
under every LIMIT.

Scale notes (100 TB): the derived ps is one map-side-combinable groupBy of
lineitem (in a warehouse it would be a materialized bucketed table). Q21's
double-EXISTS is two self-equi-joins of lineitem on l_orderkey — shuffle on
the same key, so one exchange reused; never cartesian. Q17/Q20 correlated
aggregates become key-grouped joins, broadcast when the filtered side is
dim-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from australian_company_etl_spark.operators.cache import persist_tracked
from australian_company_etl_spark.plans.tpch import (
    _D38,
    _cents,
    _cents_sql,
    _money,
    _money_sql,
    _rev_e4,
    REV_E4_SQL,
)
from australian_company_etl_spark.sources.registry import load_tables

PS_SQL = """ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min((CAST(round(l_extendedprice * 100) AS BIGINT) * 10000)
             // CAST(round(l_quantity) AS BIGINT))     AS ps_supplycost_micro,
         round(sum(l_quantity), 2)                     AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)"""

def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived part-supplier relation (the schema's stand-in for partsupp).

    Unit cost in integer micro-units: extendedprice is 2-dp money, so
    round(x*100) is an exact cent count; (cents * 10000) div qty is exact
    integer arithmetic — deterministic across engines by construction.
    round() BEFORE the bigint cast (the q1/q9/q11/q18 discipline): a bare
    CAST truncates in Spark but rounds-to-nearest in DuckDB, so a
    non-integral quantity (2.7) would silently diverge the two engines —
    and one in (0, 0.5) would truncate to 0 and raise DIVIDE_BY_ZERO under
    ANSI mode — invisibly at every tested SF, whose quantities are all
    integral."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.expr(
            "min((CAST(round(l_extendedprice * 100) AS BIGINT) * 10000)"
            " div CAST(round(l_quantity) AS BIGINT))"
        ).alias("ps_supplycost_micro"),
        F.round(F.sum("l_quantity"), 2).alias("ps_availqty"),
    )


# ── Q2: min-cost supplier (correlated-min subquery) ─────────────────────────

Q2_SIZE = 15
Q2_TYPE = "STANDARD"
Q2_REGION = "EUROPE"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier within a region —
    the correlated-min subquery becomes a window-min over the region-filtered
    join (one pass, no re-scan of the subquery)."""
    t = load_tables(spark, sf_dir, ["part", "supplier", "nation", "region"])
    part = t["part"].filter((F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE))
    region = t["region"].filter(F.col("r_name") == Q2_REGION)
    joined = (
        _ps(spark, sf_dir)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        # supplier scales with SF — unhinted, AQE broadcasts while it fits
        .join(t["supplier"], F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("ps_supplycost_micro").over(w))
        .filter(F.col("ps_supplycost_micro") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "ps_supplycost_micro",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


Q2_SQL = f"""
WITH {PS_SQL}
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, ps_supplycost_micro
FROM part, ps, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = {Q2_SIZE} AND p_type = '{Q2_TYPE}'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = '{Q2_REGION}'
  AND ps_supplycost_micro = (
    SELECT min(ps2.ps_supplycost_micro)
    FROM ps ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = '{Q2_REGION}')
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# ── Q7: volume shipping between two nations ─────────────────────────────────

Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_START, Q7_END = "1996-01-01", "1998-01-01"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year — nation dim
    joined twice under different roles (supplier side / customer side)."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"])
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit(Q7_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_END).cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ) | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        # supplier scales with SF — unhinted, AQE broadcasts while it fits
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_money(F.sum(_rev_e4().cast(_D38)), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {_money_sql(f"sum({REV_E4_SQL})", 4)}             AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
    OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
  AND l_shipdate >= TIMESTAMP '{Q7_START} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q7_END} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ── Q8: market share of one nation within a region ──────────────────────────

Q8_NATION = "NATION_2"
Q8_REGION = "ASIA"
Q8_TYPE = "ECONOMY"
Q8_START, Q8_END = "1996-01-01", "1998-01-01"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional order volume per year —
    conditional-sum ratio over a two-role nation join."""
    t = load_tables(
        spark, sf_dir, ["part", "supplier", "lineitem", "orders", "customer", "nation", "region"]
    )
    part = t["part"].filter(F.col("p_type") == Q8_TYPE)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_END).cast("timestamp"))
    )
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), "n_regionkey")
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = t["region"].filter(F.col("r_name") == Q8_REGION)
    vol = _rev_e4().cast(_D38)
    joined = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(
                        F.lit(0).cast(_D38)
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       round((sum(CASE WHEN n2.n_name = '{Q8_NATION}'
                       THEN {REV_E4_SQL} ELSE 0 END))::DOUBLE
             / (sum({REV_E4_SQL}))::DOUBLE, 4) AS mkt_share
FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
  AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
  AND n1.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
  AND s_nationkey = n2.n_nationkey AND p_type = '{Q8_TYPE}'
  AND o_orderdate >= TIMESTAMP '{Q8_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q8_END} 00:00:00'
GROUP BY 1
ORDER BY 1
"""


# ── Q9: product-type profit by nation and year ──────────────────────────────

Q9_NAME_SUBSTR = "widget"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit (revenue minus derived supply cost) per supplier
    nation per order year, for parts whose name matches a substring."""
    t = load_tables(spark, sf_dir, ["part", "supplier", "lineitem", "orders", "nation"])
    part = t["part"].filter(F.col("p_name").contains(Q9_NAME_SUBSTR))
    # exact 1e-6-unit amount: revenue e4→e6 minus micro-unit cost × integer
    # quantity — integer arithmetic end to end, summed as DECIMAL(38,0)
    amount_e6 = _rev_e4() * 100 - F.col("ps_supplycost_micro") * F.round(
        F.col("l_quantity")
    ).cast("bigint")
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            _ps(spark, sf_dir),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_money(F.sum(amount_e6.cast(_D38)), 6).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_SQL = f"""
WITH {PS_SQL}
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {_money_sql(
           f"sum({REV_E4_SQL} * 100"
           " - ps_supplycost_micro * CAST(round(l_quantity) AS BIGINT))",
           6,
       )} AS sum_profit
FROM part, supplier, lineitem, ps, orders, nation
WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
  AND p_partkey = l_partkey AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%{Q9_NAME_SUBSTR}%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


# ── Q11: important stock (scalar-subquery HAVING) ───────────────────────────

Q11_NATION = "NATION_3"
Q11_FRACTION_DEN = 1000  # threshold fraction 1/1000, kept as an exact integer


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value within one nation exceeds a
    fraction of the nation's total — group-agg filtered by a scalar
    subquery (broadcast one-row aggregate, no second scan in Spark).

    Stock value is kept in EXACT integer units through both the sum and the
    threshold compare: v = supplycost-in-micros × availqty-in-hundredths
    (both exact BIGINTs), and the 1/1000 fraction test is
    ``sum(v) * 1000 > total(v)`` — no double accumulation anywhere, so
    partition-order summation cannot flip the filter or the output at any
    scale factor. The displayed value divides the exact sum by 1e8 once."""
    t = load_tables(spark, sf_dir, ["supplier", "nation"])
    nation = t["nation"].filter(F.col("n_name") == Q11_NATION)
    v = F.col("ps_supplycost_micro") * F.expr(
        "CAST(round(ps_availqty * 100) AS BIGINT)"
    )
    nat = persist_tracked(
        _ps(spark, sf_dir)
        .join(t["supplier"], F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", v.alias("v"))
    )
    # DECIMAL(38,0) sums (the exactmath money-sum discipline): v is ~1e15
    # per row (micros × hundredths), so a bigint nation total overflows
    # int64 in the accumulation itself at large SFs; DuckDB's sum is
    # HUGEINT on its own, and the ×1000 threshold compare and the /1e8
    # display division behave identically on the decimal.
    nat_dec = nat.select("ps_partkey", F.col("v").cast("decimal(38,0)").alias("v"))
    total = nat_dec.agg(F.sum("v").alias("total_v"))
    return (
        nat_dec.groupBy("ps_partkey")
        .agg(F.sum("v").alias("raw_v"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("raw_v") * F.lit(Q11_FRACTION_DEN) > F.col("total_v"))
        .select(
            "ps_partkey", F.round(F.col("raw_v") / F.lit(1e8), 2).alias("value")
        )
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


Q11_SQL = f"""
WITH {PS_SQL},
nat AS (
  SELECT ps_partkey,
         ps_supplycost_micro * CAST(round(ps_availqty * 100) AS BIGINT) AS v
  FROM ps, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = '{Q11_NATION}'
)
SELECT ps_partkey, round(sum(v) / 100000000.0, 2) AS value
FROM nat
GROUP BY ps_partkey
HAVING sum(v) * {Q11_FRACTION_DEN} > (SELECT sum(v) FROM nat)
ORDER BY value DESC, ps_partkey ASC
"""


# ── Q13: customer order-count distribution ──────────────────────────────────

Q13_EXCLUDED_PRIORITY = "1-URGENT"


def q13_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, orders filtered
    inside a LEFT OUTER join condition (customers with zero orders count as
    c_count = 0; priority filter stands in for the comment NOT LIKE)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    orders = t["orders"].filter(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = f"""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ── Q15: top supplier (view + scalar max) ───────────────────────────────────

Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's maximum revenue — revenue
    rounded before the max so the equality is engine-stable."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem"])
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_money(F.sum(_rev_e4().cast(_D38)), 4).alias("total_revenue"))
    )
    rev = persist_tracked(rev)
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))  # SF-scaled: unhinted
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_money_sql(f"sum({REV_E4_SQL})", 4)}             AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_END} 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ── Q16: supplier count by part attributes (NOT IN) ─────────────────────────

Q16_EXCL_BRAND = "Brand#4"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 3, 9, 14, 19, 23, 36, 45)


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct suppliers per (brand, type, size) excluding one
    brand/type and "complaint" suppliers (negative balance) — the NOT IN
    subquery is a left-anti join in Spark."""
    t = load_tables(spark, sf_dir, ["part", "supplier"])
    part = t["part"].filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        _ps(spark, sf_dir)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(bad, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")  # ~10% of suppliers: unhinted
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
WITH {PS_SQL}
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps, part
WHERE p_partkey = ps_partkey
  AND p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ── Q17: small-quantity-order revenue (correlated avg) ──────────────────────

Q17_BRAND = "Brand#2"
Q17_SIZE = 10


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small orders — the correlated per-part
    average becomes a grouped join (avg of integral quantities is exact, so
    the threshold compare is engine-stable)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    part = t["part"].filter((F.col("p_brand") == Q17_BRAND) & (F.col("p_size") == Q17_SIZE))
    li = t["lineitem"].join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    # semi-join BEFORE the correlated avg (the Q20 shape): only the
    # brand/size-filtered parts' lineitems feed the per-part average —
    # aggregating all of lineitem and force-broadcasting one row per
    # distinct part would do ~1250× the aggregate work and then OOM the
    # driver at scale (avg_qty cardinality grows with the fact table).
    # The avg join stays UNHINTED: AQE broadcasts it while it fits.
    avg_qty = (
        t["lineitem"]
        .join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(_cents("l_extendedprice").cast(_D38)).cast("double") / 700.0, 2
            ).alias("avg_yearly")
        )
    )


Q17_SQL = f"""
SELECT round((sum({_cents_sql("l_extendedprice")})::BIGINT)::DOUBLE / 700.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = '{Q17_BRAND}' AND p_size = {Q17_SIZE}
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


# ── Q19: disjunctive predicate groups ───────────────────────────────────────

Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#3", 1, 10, 10, 20),
    ("Brand#19", 1, 15, 20, 30),
)


def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three OR'd (brand, size, quantity) predicate groups over
    the part join — exercises disjunction pushdown through a join."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    cond = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_BRANCHES:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = c if cond is None else cond | c
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(_money(F.sum(_rev_e4().cast(_D38)), 4).alias("revenue"))
    )


Q19_SQL = f"""
SELECT {_money_sql(f"sum({REV_E4_SQL})", 4)} AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
  OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
  OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
"""


# ── Q20: suppliers with surplus stock of promo-ish parts ────────────────────

Q20_NATION = "NATION_1"
Q20_NAME_PREFIX = "small"
Q20_START, Q20_END = "1996-01-01", "1997-01-01"


def q20_surplus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation whose derived stock of
    name-matched parts exceeds half of what they shipped that year — a
    nested IN chain that becomes semi-join → grouped join → semi-join."""
    t = load_tables(spark, sf_dir, ["supplier", "nation", "part", "lineitem"])
    nation = t["nation"].filter(F.col("n_name") == Q20_NATION)
    small = t["part"].filter(F.col("p_name").startswith(Q20_NAME_PREFIX)).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit(Q20_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_END).cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("sh_partkey"), F.col("l_suppkey").alias("sh_suppkey"))
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_shipped"))
    )
    qualifying = (
        _ps(spark, sf_dir)
        .join(F.broadcast(small), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("sh_partkey"))
            & (F.col("ps_suppkey") == F.col("sh_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_shipped"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
WITH {PS_SQL}
SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM ps
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
      AND ps_availqty > (
        SELECT 0.5 * sum(l_quantity) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '{Q20_START} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q20_END} 00:00:00'))
ORDER BY s_suppkey
"""


# ── Q21: suppliers who shipped last in multi-supplier orders ────────────────

Q21_NATION = "NATION_2"


def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no commit/receipt dates in this schema): for
    finished orders involving several suppliers, count per supplier the
    lineitems that shipped strictly after every other supplier's — the
    EXISTS / NOT EXISTS pair becomes left-semi + left-anti self-joins of
    lineitem, both shuffling on the same l_orderkey."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders", "nation"])
    nation = t["nation"].filter(F.col("n_name") == Q21_NATION)
    supp = t["supplier"].join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders_f = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_linenumber")
        .join(supp.select("s_suppkey", "s_name"), F.col("l_suppkey") == F.col("s_suppkey"))  # SF-scaled: unhinted
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    l2 = t["lineitem"].select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = t["lineitem"].select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey"))
            & (F.col("l3_shipdate") > F.col("l_shipdate")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


Q21_SQL = f"""
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
  AND s_nationkey = n_nationkey AND n_name = '{Q21_NATION}'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


# ── Q22: customers with balance but no orders ───────────────────────────────

Q22_CODES = (1, 3, 5, 7, 9)


def q22_global_sales_opp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in selected "country codes" (nationkey
    mod 10 stands in for the phone prefix) with above-average positive
    balance and no orders — scalar-subquery threshold + anti join."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    cand = t["customer"].filter((F.col("c_nationkey") % 10).isin(*Q22_CODES)).select(
        "c_custkey", "c_acctbal", (F.col("c_nationkey") % 10).alias("cc")
    )
    bal_cents = _cents("c_acctbal")
    thr = cand.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal_cents.cast(_D38)).cast("double") / (F.count("*") * 100)).alias(
            "avg_bal"
        )
    )
    return (
        cand.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cc")
        .agg(
            F.count("*").alias("numcust"),
            _money(F.sum(bal_cents.cast(_D38)), 2).alias("totacctbal"),
        )
        .orderBy("cc")
    )


Q22_SQL = f"""
WITH cand AS (
  SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cc
  FROM customer WHERE c_nationkey % 10 IN {Q22_CODES}
)
SELECT cc, count(*) AS numcust,
       {_money_sql(f"sum({_cents_sql('c_acctbal')})", 2)} AS totacctbal
FROM cand
WHERE c_acctbal > (SELECT (sum({_cents_sql('c_acctbal')})::BIGINT)::DOUBLE / (count(*) * 100)
                   FROM cand WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cc
ORDER BY cc
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q13_cust_order_dist": q13_cust_order_dist,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_count": q16_supplier_part_count,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q19_disjunctive_pred": q19_disjunctive_pred,
    "q20_surplus_suppliers": q20_surplus_suppliers,
    "q21_last_shipper": q21_last_shipper,
    "q22_global_sales_opp": q22_global_sales_opp,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_stock": Q11_SQL,
    "q13_cust_order_dist": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_part_count": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q19_disjunctive_pred": Q19_SQL,
    "q20_surplus_suppliers": Q20_SQL,
    "q21_last_shipper": Q21_SQL,
    "q22_global_sales_opp": Q22_SQL,
}
