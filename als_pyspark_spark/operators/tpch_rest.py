"""The last five TPC-H query shapes (Q11, Q12, Q15, Q16, Q20) — completing
all 22 on this schema. The test tables carry no partsupp / shipmode /
commitdate columns, so those queries keep their SHAPE (the operator
composition TPC-H exists to exercise) over the columns that exist, exactly
like q2/q18/q22 in operators/subqueries.py.

Float-determinism contract as everywhere: money math in exact DECIMAL,
one cast to DOUBLE at the end (see operators/relational.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table

_PRICE = "decimal(12,2)"
_PCT = "decimal(4,2)"
_QTY = "decimal(12,2)"


@query(
    "q11_important_part_values",
    oracle="""
WITH nation3 AS (
    SELECT l.l_partkey AS pk,
           SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS value
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_nationkey = 3
    GROUP BY l.l_partkey
),
total AS (SELECT SUM(value) AS t FROM nation3)
SELECT pk AS l_partkey, CAST(value AS DOUBLE) AS value
FROM nation3, total
WHERE value * 500 > t
""",
    tags=("tpch", "subquery", "scalar", "having"),
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a scalar fraction of the global
    total (important stock). Threshold in multiplication form
    (value·500 > total, i.e. value > 0.2% of total) — exact DECIMAL
    comparison, no division. The scalar total is a 1-row broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    nation3 = (
        l.join(F.broadcast(s.where(F.col("s_nationkey") == 3)), l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(F.col("l_extendedprice").cast(_PRICE)).alias("value"))
    )
    total = nation3.agg(F.sum("value").alias("t"))
    return (
        nation3.crossJoin(F.broadcast(total))
        .where(F.col("value") * 500 > F.col("t"))
        .select(F.col("pk").alias("l_partkey"), F.col("value").cast("double").alias("value"))
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
SELECT CASE WHEN l.l_shipdate - o.o_orderdate > INTERVAL 60 DAY
            THEN 'late' ELSE 'on_time' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
    tags=("tpch", "join", "case", "agg"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + bucketed conditional counts (priority mix
    per shipping bucket). No shipmode column, so the bucket is shipping
    delay (shipdate > 60 days after orderdate = 'late')."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .select(
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("late"),
            )
            .otherwise(F.lit("on_time"))
            .alias("ship_bucket"),
            high.alias("high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~F.col("high"), 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier_revenue",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=("tpch", "view", "scalar", "max"),
)
def q15_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue view over a quarter, then the supplier(s)
    achieving the maximum — scalar-subquery max with exact DECIMAL revenue
    so ties survive identically on both engines (the semantics a window
    top-1 would get wrong)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_PRICE)
                * (F.lit(1) - F.col("l_discount").cast(_PCT))
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), s.s_suppkey == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
    )


@query(
    "q16_supplier_counts_by_part",
    oracle="""
SELECT p.p_brand AS p_brand,
       CAST(p.p_size // 10 AS BIGINT) AS size_band,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
GROUP BY 1, 2
""",
    tags=("tpch", "distinct", "notin", "anti"),
)
def q16_supplier_counts_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute group,
    with a NOT IN supplier exclusion (low balance stands in for the
    complaint-comment filter; partsupp pairs come from lineitem)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    excluded = s.where(F.col("s_acctbal") < 2000).select("s_suppkey")
    return (
        l.join(excluded, l.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p.where(F.col("p_brand") != "Brand#13")), p.p_partkey == l.l_partkey)
        .groupBy(
            "p_brand",
            (F.col("p_size") / 10).cast("long").alias("size_band"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_heavy_shippers_of_parts",
    oracle="""
WITH shipped AS (
    SELECT l.l_suppkey AS sk,
           SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS qty
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, s.s_nationkey AS s_nationkey
FROM supplier s
WHERE s.s_suppkey IN (SELECT sk FROM shipped WHERE qty > 50)
""",
    tags=("tpch", "semi", "nested-in", "agg"),
)
def q20_heavy_shippers_of_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN chains — parts by name pattern → their
    heavy shippers in a year → the supplier rows. Two semi joins and an
    aggregated HAVING, never a row multiplication against supplier."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    wanted_parts = p.where(F.col("p_name").contains("widget")).select("p_partkey")
    shipped = (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(wanted_parts, l.l_partkey == wanted_parts.p_partkey, "left_semi")
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.col("l_quantity").cast(_QTY)).alias("qty"))
        .where(F.col("qty") > 50)
        .select("sk")
    )
    return s.join(shipped, s.s_suppkey == shipped.sk, "left_semi").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
