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


def load_all_queries() -> dict[str, Query]:
    """Import every module that registers queries, then return the registry."""
    # Imports are side-effectful (decorator registration); keep the list
    # explicit so a broken module is an import error, not silent missing
    # coverage.
    import als_pyspark_spark.operators.relational  # noqa: F401
    import als_pyspark_spark.operators.joins  # noqa: F401
    import als_pyspark_spark.operators.windows  # noqa: F401
    import als_pyspark_spark.operators.aggregates  # noqa: F401
    import als_pyspark_spark.operators.setops  # noqa: F401
    import als_pyspark_spark.operators.scalar_funcs  # noqa: F401
    import als_pyspark_spark.operators.subqueries  # noqa: F401
    import als_pyspark_spark.operators.grouping  # noqa: F401
    import als_pyspark_spark.operators.tpch_more  # noqa: F401
    import als_pyspark_spark.operators.physical  # noqa: F401
    import als_pyspark_spark.functions.pandas_udfs  # noqa: F401
    import als_pyspark_spark.streaming.queries  # noqa: F401
    import als_pyspark_spark.operators.events  # noqa: F401
    import als_pyspark_spark.sources.sinks  # noqa: F401
    import als_pyspark_spark.ml.queries  # noqa: F401
    import als_pyspark_spark.dedup.queries  # noqa: F401
    import als_pyspark_spark.similarity.queries  # noqa: F401
    import als_pyspark_spark.functions.text_queries  # noqa: F401
    import als_pyspark_spark.multimodal.queries  # noqa: F401

    return QUERIES
