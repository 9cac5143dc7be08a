"""Multi-dimensional aggregation: GROUPING SETS and PIVOT.

The reference's only aggregation is the hand-rolled per-block merge
(SURVEY.md §2.5 A1/A2); cube/rollup live in operators/aggregates.py and the
explicit GROUPING SETS + pivot forms live here — together they complete the
grouping-operator family.

Scale notes: Spark plans grouping sets as a single Expand + HashAggregate —
one pass over the fact table regardless of how many sets are requested (the
alternative, one scan per set + union, is what Expand avoids at 100 TB).
Pivot with explicit values compiles to conditional aggregates in one pass;
always pass the value list so Spark skips the extra distinct-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table

_PRICE = "decimal(12,2)"

# o_orderstatus values are a closed set in the test data; explicit pivot
# values keep the plan single-pass and the output schema static.
_STATUSES = ("F", "O", "P")


@query(
    "q_grouping_sets_orders",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_prio,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    tags=("agg", "groupingsets"),
)
def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status-only, priority-only, grand total) with
    GROUPING() indicators — one Expand+HashAggregate pass, not three scans."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_pivot_priority_by_status",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS price_f
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "pivot"),
)
def q_pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT order counts (and one pivoted sum) by status — compiles to
    conditional aggregates in a single pass given the explicit value list."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(_PRICE)).alias("price"),
        )
    )
    # Spark pivot yields NULL for absent (priority, status) combos where
    # SQL's COUNT(*) FILTER yields 0 — coalesce to match.
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_p"),
        F.coalesce(F.col("F_price"), F.lit(0).cast(_PRICE)).cast("double").alias("price_f"),
    )


@query(
    "q_rollup_region_hierarchy",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    tags=("grouping", "rollup", "hierarchy"),
)
def q_rollup_region_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-hierarchy rollup: region → nation → grand total over a
    two-hop dimension join (the OLAP drill-down cube a BI layer asks for).
    Both dimension joins broadcast (nation and region are tiny at every
    scale); the rollup expands each row into its 3 grouping sets before
    one exchange — subtotals cost one aggregate, not three queries."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_balance"),
        )
    )
