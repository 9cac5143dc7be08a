"""Additional TPC-H-shaped queries: multi-nation joins, market share,
promo ratio, OR-of-ANDs pushdown — the join/agg shapes the first wave
(relational.py) didn't cover.

Float-determinism: every revenue is an exact DECIMAL sum; ratios are ONE
double division of two exact decimals (deterministic on both engines —
what's forbidden is double SUMS, not double division).

Scale notes: nation is broadcast everywhere it appears (25 rows); the
fact-side joins shuffle once on their natural keys; q19's disjunctive
predicate stays a single scan filter (Catalyst pushes the OR-of-ANDs to
the parquet reader rather than unioning three scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table

_PRICE = "decimal(12,2)"
_PCT = "decimal(4,2)"


@query(
    "q7_nation_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
GROUP BY 1, 2, 3
""",
    tags=("join", "agg", "tpch", "broadcast"),
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by (supplier nation,
    customer nation, year) — a 6-way join with the same dimension table
    (nation) joined twice under different roles."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("nk1") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("nk2") == c.c_nationkey)
        .where(F.col("nk1") != F.col("nk2"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_PRICE)
                * (F.lit(1) - F.col("l_discount").cast(_PCT))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
WITH yearly AS (
    SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           SUM(CASE WHEN s.s_nationkey = 1
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS nation_rev,
           SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS total_rev
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1
)
SELECT o_year,
       CAST(CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS DOUBLE) AS mkt_share
FROM yearly
""",
    tags=("join", "agg", "tpch", "ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly revenue — conditional
    aggregate over a join, then a single double division of two exact
    decimal sums (ratio stays deterministic)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    disc = F.col("l_extendedprice").cast(_PRICE) * (F.lit(1) - F.col("l_discount").cast(_PCT))
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("s_nationkey") == 1, disc).otherwise(F.lit(0).cast(_PRICE))).alias("nation_rev"),
            F.sum(disc).alias("total_rev"),
        )
        .select(
            "o_year",
            (F.col("nation_rev").cast("double") / F.col("total_rev").cast("double"))
            .cast("double")
            .alias("mkt_share"),
        )
    )


@query(
    "q14_promo_revenue_pct",
    oracle="""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    tags=("join", "agg", "tpch", "ratio"),
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast(_PRICE) * (F.lit(1) - F.col("l_discount").cast(_PCT))
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
        )
        .join(p, p.p_partkey == l.l_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(
                        F.lit(0).cast(_PRICE)
                    )
                ).cast("double")
                / F.sum(disc).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_size BETWEEN 1 AND 10  AND l.l_quantity BETWEEN 1 AND 15  AND p.p_type LIKE 'SMALL%')
   OR (p.p_size BETWEEN 11 AND 25 AND l.l_quantity BETWEEN 10 AND 30 AND p.p_type LIKE 'MEDIUM%')
   OR (p.p_size BETWEEN 26 AND 50 AND l.l_quantity BETWEEN 20 AND 50 AND p.p_type LIKE 'LARGE%')
""",
    tags=("join", "filter", "tpch", "pushdown"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of three conjunctive branches over the joined
    pair — one scan with the disjunction pushed down, not three unioned
    scans."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    b1 = (
        F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
        & F.col("p_type").startswith("SMALL")
    )
    b2 = (
        F.col("p_size").between(11, 25)
        & F.col("l_quantity").between(10, 30)
        & F.col("p_type").startswith("MEDIUM")
    )
    b3 = (
        F.col("p_size").between(26, 50)
        & F.col("l_quantity").between(20, 50)
        & F.col("p_type").startswith("LARGE")
    )
    disc = F.col("l_extendedprice").cast(_PRICE) * (F.lit(1) - F.col("l_discount").cast(_PCT))
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .where(b1 | b2 | b3)
        .agg(
            F.sum(disc).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    tags=("join", "agg", "tpch", "histogram"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregation OF an aggregation — orders per
    customer (outer join keeps zero-order customers, COUNT(col) skips the
    NULLs), then the histogram of those counts. The double-groupBy shape
    no other query here has."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q9_profit_by_nation_year",
    oracle="""
SELECT n.n_name AS nation,
       EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       CAST(SUM(
           CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
           - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1))
       ) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%a%'
GROUP BY 1, 2
""",
    tags=("join", "agg", "tpch"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by (supplier nation, year) — a
    5-way join with a compound profit measure. The test schema has no
    partsupp, so supply cost is modeled as 10% of p_retailprice (the
    join/agg shape, which is what Q9 exercises, is unchanged)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("a"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(_PCT)
    ) - F.col("p_retailprice").cast(_PRICE) * F.col("l_quantity").cast(_PRICE) * F.lit(
        0.1
    ).cast("decimal(2,1)")
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )
