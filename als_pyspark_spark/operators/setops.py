"""Set operations (absent from the reference entirely)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table


def _buyers_of(spark: SparkSession, sf_dir: str, returnflag: str) -> DataFrame:
    """Custkeys whose orders contain a line with the given return flag."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == returnflag)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .select("o_custkey")
        .distinct()
    )


_BUYERS_CTE = """
WITH r_buyers AS (
    SELECT DISTINCT o_custkey FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
), n_buyers AS (
    SELECT DISTINCT o_custkey FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'N')
)
"""


@query(
    "q_intersect_buyers",
    oracle=_BUYERS_CTE
    + "SELECT o_custkey FROM r_buyers INTERSECT SELECT o_custkey FROM n_buyers",
    tags=("setop", "intersect"),
)
def q_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both returned and kept lineitems."""
    return _buyers_of(spark, sf_dir, "R").intersect(_buyers_of(spark, sf_dir, "N"))


@query(
    "q_except_buyers",
    oracle=_BUYERS_CTE
    + "SELECT o_custkey FROM r_buyers EXCEPT SELECT o_custkey FROM n_buyers",
    tags=("setop", "except"),
)
def q_except_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: return-only customers."""
    return _buyers_of(spark, sf_dir, "R").exceptAll(_buyers_of(spark, sf_dir, "N")).distinct()


@query(
    "q_except_all_repeat_custkeys",
    oracle="""
SELECT o_custkey AS custkey FROM orders
EXCEPT ALL
SELECT c_custkey FROM customer
""",
    tags=("setop", "exceptall"),
)
def q_except_all_repeat_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset semantics): each custkey survives with
    multiplicity n_orders - 1 — the bag-difference operator plain EXCEPT
    can't express."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@query(
    "q_intersect_all_statuses",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("setop", "intersectall"),
)
def q_intersect_all_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: custkeys kept min(m, n) times across the two order
    subsets — multiset intersection."""
    o = load_table(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    p = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersectAll(p)


@query(
    "q_union_all_keys",
    oracle="""
SELECT kind, COUNT(*) AS n FROM (
    SELECT 'customer' AS kind, c_custkey AS k FROM customer
    UNION ALL
    SELECT 'supplier' AS kind, s_suppkey AS k FROM supplier
    UNION ALL
    SELECT 'part' AS kind, p_partkey AS k FROM part
) GROUP BY kind
""",
    tags=("setop", "union"),
)
def q_union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across three heterogeneous tables, tagged and counted."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_custkey").alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("k")
    )
    p = load_table(spark, sf_dir, "part").select(
        F.lit("part").alias("kind"), F.col("p_partkey").alias("k")
    )
    return c.unionAll(s).unionAll(p).groupBy("kind").agg(F.count("*").alias("n"))


@query(
    "q_union_by_name",
    oracle="""
WITH unioned AS (
    SELECT o_orderkey AS key, o_totalprice AS amount, 'order' AS src
    FROM orders
    UNION ALL BY NAME
    SELECT 'line' AS src, l_extendedprice AS amount, l_orderkey AS key
    FROM lineitem
    WHERE l_orderkey < 1000
)
SELECT src,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(amount AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM unioned
GROUP BY src
""",
    tags=("setop", "union-by-name"),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION by column NAME, not position: the two sides present the same
    columns in different order (the schema-evolution reality when stitching
    exports from different eras) — positional UNION ALL would silently pair
    keys with amounts. Spark's unionByName ≡ DuckDB's UNION ALL BY NAME."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
        F.lit("order").alias("src"),
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 1000)
        .select(
            F.lit("line").alias("src"),
            F.col("l_extendedprice").alias("amount"),
            F.col("l_orderkey").alias("key"),
        )
    )
    return (
        o.unionByName(li)
        .groupBy("src")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("amount").cast("decimal(14,2)"))
            .cast("double")
            .alias("total"),
        )
    )
