"""Relational query surface (SURVEY.md §2.2: projection/filter, all join
kinds, aggregations, window functions, sorts/top-k, set ops, scalar
functions).

Every query here has a DuckDB oracle in ``ORACLES`` with **identical
column aliases** (driver contract). Normalization rules (SURVEY.md §5.1):
float aggregates rounded; timestamps serialized to strings / epoch
micros; every ranked/limited query carries a deterministic tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from flink_note_spark.functions.scalar import fmt_date
from flink_note_spark.operators.joins import range_join
from flink_note_spark.operators.windows import topk_per_group
from flink_note_spark.session import load_table as _t


# --- Q1-like pricing summary (agg: sum/avg/count over filtered scan) ----

def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate. The shipdate predicate must
    reach the parquet scan (PushedFilters) — asserted in tests."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- projection / filter / predicate surface ----------------------------

def q02_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """select / where with BETWEEN, IN, LIKE + computed projections, plus
    the full string-function surface (absorbed q19_string_funcs in round 4
    so the registry stays ≤50 entries and every query is driver-checked).
    """
    p = _t(spark, sf, "part")
    return (
        p.filter(
            F.col("p_size").between(5, 20)
            & F.col("p_type").isin("PROMO", "ECONOMY")
            & F.col("p_name").like("%ol%")
        )
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_up"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
            F.upper(F.substring("p_name", 1, 5)).alias("name5"),
            F.length("p_name").alias("name_len"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
            F.regexp_extract("p_brand", "#(\\d+)", 1).alias("brand_num"),
            F.levenshtein("p_type", F.lit("PROMO")).alias("lev_promo"),
            F.lower(F.trim("p_type")).alias("type_lc"),
        )
    )


_Q02_SQL = r"""
SELECT p_partkey,
       upper(p_name)                     AS name_up,
       concat_ws('/', p_brand, p_type)   AS brand_type,
       round(p_retailprice * 1.1, 2)     AS marked_up,
       upper(substring(p_name, 1, 5))    AS name5,
       length(p_name)                    AS name_len,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
       regexp_extract(p_brand, '#(\d+)', 1)       AS brand_num,
       levenshtein(p_type, 'PROMO')      AS lev_promo,
       lower(trim(p_type))               AS type_lc
FROM part
WHERE p_size BETWEEN 5 AND 20
  AND p_type IN ('PROMO', 'ECONOMY')
  AND p_name LIKE '%ol%'
"""


# --- Q3-like: 3-way join + agg + top-n with deterministic tiebreak ------

def q03_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """No forced broadcast: customer scales with SF, so the broadcast-vs-
    shuffle choice is left to stats + AQE (which picks broadcast at small
    SF and will correctly refuse at 100× — asserted in test_plans)."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            fmt_date("o_orderdate", "orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q03_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- Q5-like: 6-way star join --------------------------------------------

def q05_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Star join lineitem⋈orders⋈customer⋈supplier⋈nation⋈region. Only the
    FIXED-size dims (nation=25, region=5 rows at every SF) carry a
    broadcast hint; supplier/customer grow with SF, so their join strategy
    is left to stats + AQE (SURVEY.md §7.3 posture, VERDICT r2 item 2)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q05_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)                                          AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# --- semi / anti / outer joins -------------------------------------------

def q06_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


_Q06_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q07_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


_Q07_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def q08_outer_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join preserving order-less customers; COUNT(col) vs
    COUNT(*) semantics on the null-extended side."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias(
                "total_spent"
            ),
        )
    )


_Q08_SQL = """
SELECT c_custkey, c_mktsegment,
       count(o_orderkey)                          AS n_orders,
       round(sum(coalesce(o_totalprice, 0.0)), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def q09_broadcast_join(spark: SparkSession, sf: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint; plan must show
    BroadcastHashJoin (asserted in tests — SURVEY.md 'optimize' rules).

    The hinted side is nation — FIXED at 25 rows at every SF, so the hint
    is safe at 100 TB. (Round 4: previously hinted ``part``, which grows
    with SF — the exact anti-pattern VERDICT r2 item 2 flags; hints on
    SF-scaled tables are now banned by test_plans.)"""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


_Q09_SQL = """
SELECT n_name, round(sum(c_acctbal), 2) AS sum_bal, count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q10_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-prefixed range join (SURVEY.md §2.2 'Range/interval join'):
    lineitems shipped within 60 days of their order date."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    joined = range_join(
        li,
        o,
        equi=li.l_orderkey == o.o_orderkey,
        lo=F.col("l_shipdate") >= F.col("o_orderdate"),
        hi=F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_fast_shipped"),
        F.round(F.sum("l_extendedprice"), 2).alias("fast_revenue"),
    )


_Q10_SQL = """
SELECT o_orderpriority,
       count(*)                          AS n_fast_shipped,
       round(sum(l_extendedprice), 2)    AS fast_revenue
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <  o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
"""


# --- window functions ----------------------------------------------------

def q11_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 orders by price per priority — row_number pattern
    (SURVEY.md §2.2 'Sorts / limits / top-k')."""
    o = _t(spark, sf, "orders")
    top = topk_per_group(
        o,
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )
    return top.select(
        "o_orderpriority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        "rn",
    )


_Q11_SQL = """
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q12_window_analytics(spark: SparkSession, sf: str) -> DataFrame:
    """lag + running frame aggregate per customer order history."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_spent"),
        F.row_number().over(w).alias("order_seq"),
    )


_Q12_SQL = """
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_spent,
       row_number() OVER w AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --- grouping sets / cube / rollup ---------------------------------------

_Q13_GSETS_SQL = """
SELECT 'gsets' AS mode,
       l_returnflag AS k1, l_linestatus AS k2,
       round(sum(l_extendedprice), 2) AS m1,
       CAST(NULL AS DOUBLE) AS m2
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q13_cube_rollup_gsets(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE + ROLLUP + GROUPING SETS as one tagged union (merged q13/q14/
    q15 in round 4 — registry ≤50 so every query is driver-checked). Each
    branch keeps its original shape: cube over lineitem flags, rollup over
    region→nation customer stats (fixed-size dims broadcast), grouping
    sets through the SQL entry point (same text on both engines)."""
    li = _t(spark, sf, "lineitem")
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("m1"),
            F.count(F.lit(1)).cast("double").alias("m2"),
        )
        .select(
            F.lit("cube").alias("mode"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "m1",
            "m2",
        )
    )
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    rollup = (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("m1"),
            F.round(F.avg("c_acctbal"), 4).alias("m2"),
        )
        .select(
            F.lit("rollup").alias("mode"),
            F.col("r_name").alias("k1"),
            F.col("n_name").alias("k2"),
            "m1",
            "m2",
        )
    )
    li.createOrReplaceTempView("lineitem")
    gsets = spark.sql(_Q13_GSETS_SQL)
    return cube.unionByName(rollup).unionByName(gsets)


_Q13_SQL = f"""
SELECT 'cube' AS mode,
       l_returnflag AS k1, l_linestatus AS k2,
       round(sum(l_quantity), 2) AS m1,
       CAST(count(*) AS DOUBLE)  AS m2
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'rollup', r_name, n_name,
       CAST(count(*) AS DOUBLE), round(avg(c_acctbal), 4)
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
UNION ALL
{_Q13_GSETS_SQL}
"""


# --- set operations --------------------------------------------------------

def q16_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT then EXCEPT (distinct semantics on both engines)."""
    o = _t(spark, sf, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.intersect(op).subtract(p)


_Q16_SQL = """
(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
 INTERSECT
 SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


def q17_union_agg(spark: SparkSession, sf: str) -> DataFrame:
    """UNION ALL of two branches then aggregate (unionByName) with
    count / countDistinct / max / min in one pass (absorbed
    q18_distinct_agg's agg surface in round 4 — registry ≤50)."""
    o = _t(spark, sf, "orders")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey", F.col("o_totalprice"), F.lit("urgent").alias("bucket")
    )
    lo = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey", F.col("o_totalprice"), F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


_Q17_SQL = """
SELECT bucket, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers,
       round(max(o_totalprice), 2) AS max_price,
       round(min(o_totalprice), 2) AS min_price
FROM (
  SELECT o_custkey, o_totalprice, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_custkey, o_totalprice, 'low'    AS bucket FROM orders WHERE o_orderpriority = '5-LOW'
)
GROUP BY bucket
"""


# --- scalar function surface ----------------------------------------------

def q20_datetime_funcs(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        fmt_date(F.date_trunc("month", F.col("o_orderdate")), "month_start"),
    )


_Q20_SQL = """
SELECT o_orderkey,
       date_part('year',  o_orderdate)::INT AS o_year,
       date_part('month', o_orderdate)::INT AS o_month,
       date_part('day',   o_orderdate)::INT AS o_day,
       datediff('day', DATE '1995-01-01', o_orderdate)::INT AS days_since_95,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
FROM orders
"""


def q21_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.pow("l_discount", F.lit(2))), 6).alias("sum_disc_sq"),
        F.round(F.sum(F.log(F.col("l_extendedprice") + 1)), 4).alias("sum_log_price"),
        F.round(F.max(F.sqrt("l_quantity")), 6).alias("max_sqrt_qty"),
        F.min(F.floor(F.col("l_tax") * 100)).alias("min_tax_pct"),
        F.max(F.ceil(F.col("l_discount") * 100)).alias("max_disc_pct"),
        F.round(F.avg(F.abs(F.col("l_quantity") - 25)), 4).alias("avg_abs_dev"),
    )


_Q21_SQL = """
SELECT l_returnflag,
       round(sum(pow(l_discount, 2)), 6)        AS sum_disc_sq,
       round(sum(ln(l_extendedprice + 1)), 4)   AS sum_log_price,
       round(max(sqrt(l_quantity)), 6)          AS max_sqrt_qty,
       min(floor(l_tax * 100))::BIGINT          AS min_tax_pct,
       max(ceil(l_discount * 100))::BIGINT      AS max_disc_pct,
       round(avg(abs(l_quantity - 25)), 4)      AS avg_abs_dev
FROM lineitem GROUP BY l_returnflag
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_shipping_priority": q03_shipping_priority,
    "q05_local_supplier": q05_local_supplier,
    "q06_semi_join": q06_semi_join,
    "q07_anti_join": q07_anti_join,
    "q08_outer_join_agg": q08_outer_join_agg,
    "q09_broadcast_join": q09_broadcast_join,
    "q10_range_join": q10_range_join,
    "q11_topk_per_group": q11_topk_per_group,
    "q12_window_analytics": q12_window_analytics,
    "q13_cube_rollup_gsets": q13_cube_rollup_gsets,
    "q16_set_ops": q16_set_ops,
    "q17_union_agg": q17_union_agg,
    "q20_datetime_funcs": q20_datetime_funcs,
    "q21_math_funcs": q21_math_funcs,
}

ORACLES = {
    "q01_pricing_summary": _Q01_SQL,
    "q02_filter_project": _Q02_SQL,
    "q03_shipping_priority": _Q03_SQL,
    "q05_local_supplier": _Q05_SQL,
    "q06_semi_join": _Q06_SQL,
    "q07_anti_join": _Q07_SQL,
    "q08_outer_join_agg": _Q08_SQL,
    "q09_broadcast_join": _Q09_SQL,
    "q10_range_join": _Q10_SQL,
    "q11_topk_per_group": _Q11_SQL,
    "q12_window_analytics": _Q12_SQL,
    "q13_cube_rollup_gsets": _Q13_SQL,
    "q16_set_ops": _Q16_SQL,
    "q17_union_agg": _Q17_SQL,
    "q20_datetime_funcs": _Q20_SQL,
    "q21_math_funcs": _Q21_SQL,
}
