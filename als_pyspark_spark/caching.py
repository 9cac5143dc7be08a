"""Bounded-result materialization for queries that persist intermediates.

Queries that ``persist()`` an intermediate (an edge list both sides of a
self-join read, a bucket table reused across phases) must not leak that
cache past their own lifetime: a 247-query registry sweep in one Spark
session would otherwise accumulate hundreds of cached tables (the
reference's C1-C3 persist→materialize→unpersist discipline, which its
training loop applies per iteration, applies per QUERY here).

``collected`` is for queries whose RESULT is bounded at any scale (top-k,
fixed histograms, decile tables): run the final action inside the query,
unpersist every intermediate in a ``finally``, and hand back the rows as a
local DataFrame with the original schema. The caller's later ``collect``
is then free, and nothing stays cached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def collected(spark: SparkSession, result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` (must be bounded — top-k / fixed-grain only),
    unpersist ``cached`` intermediates even on failure, and return the rows
    re-wrapped as a DataFrame with ``result``'s exact schema."""
    try:
        rows = result.collect()
    finally:
        for c in cached:
            c.unpersist()
    return spark.createDataFrame(rows, result.schema)
