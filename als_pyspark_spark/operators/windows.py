"""Window functions & grouped top-k (absent from the reference, SURVEY.md
§2.6 — it only has within-partition Python sorts, InBlock.py:50-51).

Scale notes: windows shuffle once on partitionBy keys; per-key top-k via
row_number is the scalable replacement for the reference's driver-side
collect-and-sort. Running sums use DECIMAL so the oracle hash matches
independent of the engines' window-frame accumulation strategy (DuckDB uses
segment trees — double association order differs from Spark's running state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table


@query(
    "q_window_topk_orders_per_customer",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rk
FROM (
    SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS rk
    FROM orders
) WHERE rk <= 3
""",
    tags=("window", "topk"),
)
def q_window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number window).

    Same shape as top-k recommendation output (ml/als.py); deterministic
    tie-break on o_orderkey.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@query(
    "q_window_running_spend",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend
FROM orders
""",
    tags=("window", "running"),
)
def q_window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over order history."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "q_window_lag_gap_days",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       DATEDIFF('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
                o_orderdate) AS days_since_prev
FROM orders
""",
    tags=("window", "lag"),
)
def q_window_lag_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window: days between consecutive orders of a customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).cast("long").alias("days_since_prev"),
    )


@query(
    "q_global_top25_lineitems",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 25
""",
    tags=("sort", "limit", "topk"),
)
def q_global_top25_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → TakeOrderedAndProject (no full sort)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(25)
    )


@query(
    "q_window_rank_parts_by_size",
    oracle="""
SELECT p_brand,
       p_partkey,
       RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_rank,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS dense_size_rank
FROM part
""",
    tags=("window", "rank"),
)
def q_window_rank_parts_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK with ties (many parts share a size per brand)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_size"))
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).cast("long").alias("size_rank"),
        F.dense_rank().over(w).cast("long").alias("dense_size_rank"),
    )


@query(
    "q_window_distribution",
    oracle="""
SELECT c_custkey,
       c_nationkey,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
""",
    tags=("window", "distribution"),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist) per
    nation, ordered by balance with a deterministic key tie-break.

    percent_rank and cume_dist are exact small-integer divisions — the
    same double on both engines, so they hash-match without rounding.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "q_window_moving_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
            / COUNT(*) OVER w AS DOUBLE) AS moving_avg3,
       COUNT(*) OVER w AS frame_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame", "movingavg"),
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: 3-order moving average per customer.

    The average is exact-DECIMAL frame SUM, one double division by the
    frame COUNT — decimal AVG itself rounds at engine-specific scales
    (Spark scale 6 vs DuckDB's wider quotient), so SUM/COUNT is the
    deterministic form.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-2, 0)
    )
    frame_sum = F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w)
    frame_n = F.count("*").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (frame_sum.cast("double") / frame_n).cast("double").alias("moving_avg3"),
        frame_n.alias("frame_n"),
    )


@query(
    "q_window_rolling_90d_spend",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey
            ORDER BY CAST(epoch(o_orderdate) AS BIGINT) ASC
            RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS spend_90d,
       CAST(COUNT(*) OVER (
            PARTITION BY o_custkey
            ORDER BY CAST(epoch(o_orderdate) AS BIGINT) ASC
            RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_orders_90d
FROM orders
""",
    tags=("window", "range-frame", "event-time"),
)
def q_window_rolling_90d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 90-day spend per customer — a RANGE window frame over event
    time (7776000 s = 90 days), the form retention/velocity features take.

    RANGE (not ROWS) frames are tie-exact: every order on the same date
    lands in the same frame on both engines, so no orderkey tie-break is
    needed. Ordering is on integer epoch seconds — identical frame bounds
    arithmetic in Spark's rangeBetween and DuckDB's RANGE PRECEDING.
    One shuffle on the partition key; DECIMAL frame sums."""
    o = load_table(spark, sf_dir, "orders")
    # o_orderdate may arrive NTZ (no direct cast to long); the session is
    # pinned UTC, so NTZ→timestamp→epoch-seconds is exact.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("spend_90d"),
        F.count("*").over(w).cast("long").alias("n_orders_90d"),
    )


@query(
    "q_window_ntile_by_nation",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(NTILE(4) OVER (
            PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC
       ) AS INT) AS wealth_quartile
FROM customer
""",
    tags=("window", "ntile"),
)
def q_window_ntile_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation wealth quartiles via ntile(4) — bucketing WITHIN a
    partition key, which is the scale-safe way to use ntile (a global
    ntile funnels the corpus through one partition; see
    q_curriculum_stages for the global-quartile alternative).
    Fully deterministic order: (acctbal DESC, custkey ASC)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("int").alias("wealth_quartile"),
    )


@query(
    "q_window_first_last_ignore_nulls",
    oracle="""
SELECT l_orderkey, l_linenumber,
       FIRST_VALUE(CASE WHEN l_discount > 0 THEN l_discount END IGNORE NULLS)
           OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_discount, l_partkey, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS first_discount,
       LAST_VALUE(CASE WHEN l_discount > 0 THEN l_discount END IGNORE NULLS)
           OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_discount, l_partkey, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_discount
FROM lineitem
""",
    tags=("window", "ignore-nulls"),
)
def q_window_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE with IGNORE NULLS over a full-partition
    frame: the first and last non-zero discount in each order's line
    sequence (zero discounts nulled out). Null-skipping window semantics
    are a distinct operator surface from plain first/last — both engines
    implement the SQL:2011 IGNORE NULLS clause. Deterministic: the frame
    is the whole partition, and the ordering key includes l_discount, so
    rows that tie on every key column carry equal discounts — the picked
    value is well-defined even though the synthetic lineitem duplicates
    (orderkey, linenumber) pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_discount", "l_partkey", "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    d = F.when(F.col("l_discount") > 0, F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first(d, ignorenulls=True).over(w).alias("first_discount"),
        F.last(d, ignorenulls=True).over(w).alias("last_discount"),
    )


@query(
    "q_revenue_mom_change",
    oracle="""
WITH m AS (
    SELECT DATE_TRUNC('month', o_orderdate) AS month,
           SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
    FROM orders
    GROUP BY 1
)
SELECT STRFTIME(month, '%Y-%m') AS month,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS delta,
       CAST(CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE)
            / CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS DOUBLE)
           AS pct_change
FROM m
""",
    tags=("window", "timeseries", "mom"),
)
def q_revenue_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue delta and percent change: aggregate to the
    month grain FIRST (DECIMAL-exact sums), then a lag window over the
    resulting month series. The window is global but over the AGGREGATED
    table — bounded by the calendar (≤ a few thousand months for any
    horizon), which is the scale-safe place for an unpartitioned window:
    the corpus-sized shuffle happens in the keyed month aggregate, never
    in the window. First month's change is NULL by definition."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("rev")
    )
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    delta = (F.col("rev") - prev).cast("double")
    return m.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        F.col("rev").cast("double").alias("revenue"),
        delta.alias("delta"),
        (delta / prev.cast("double")).alias("pct_change"),
    )
