"""Deterministic ratings fixture (FIXTURES.md §1).

The reference's native input is CSV lines ``user,item,rating`` parsed into
``Rating(int, int, float)`` (reference ALS.py:590-592, Rating.py:4-18).
The driver test data has no ratings file, so we derive one deterministically
from the TPC-H-ish tables — same SQL on the Spark and DuckDB sides, so every
ratings-adjacent relational query keeps an exact oracle.

Scale notes: this is a single co-keyed join (lineitem ⋈ orders on
l_orderkey = o_orderkey) plus an exact-distinct groupBy — both shuffle on
their natural keys and both benefit from AQE coalescing. No driver-side work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.sources.tables import load_table

# DuckDB-side CTE body; keep EXACTLY in sync with ``ratings`` below.
# NB: FLOOR not CAST for the quantity bucket — Spark CAST(double AS INT)
# truncates while DuckDB CAST rounds; FLOOR has identical semantics in both.
RATINGS_CTE = """
SELECT o.o_custkey AS user,
       l.l_partkey AS item,
       CAST(1.0 + (CAST(FLOOR(l.l_quantity) AS INT) % 5) AS FLOAT) AS rating
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3
"""


def ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of RATINGS_CTE: (user INT-like, item, rating FLOAT)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            o.o_custkey.alias("user"),
            l.l_partkey.alias("item"),
            (F.lit(1.0) + (F.floor(l.l_quantity).cast("int") % 5))
            .cast("float")
            .alias("rating"),
        )
        .distinct()
    )
