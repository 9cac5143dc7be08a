"""Parquet table sources (reference S1/S2, SURVEY.md §2.1).

The reference's only source is ``sc.textFile`` + hand parsing
(reference ALS.py:590-592). Here every table is a parquet scan planned by
Catalyst: column pruning and predicate pushdown reach the scan for free, and
the vectorized reader keeps decode JVM-side.

Scale notes (100 TB design):
- Scans stay declarative (``spark.read.parquet``) so partition pruning works
  when tables are directory-partitioned; nothing here collects to the driver.
- ``spark.sql.files.maxPartitionBytes`` (default 128 MiB) controls scan
  parallelism — at 100 TB that is ~800k tasks, which is the correct shape for
  a 1000-executor cluster; no per-table hand-tuning is needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Timestamp semantics contract with the DuckDB oracle: all date_format/
    # date_trunc/window results assume UTC. build_session pins this, but
    # queries must also hold under a CALLER-OWNED session (the round driver
    # builds its own), so pin it on the load path every query goes through.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects. Read the raw int64 nanos and convert with exact integer
        # division to a microsecond timestamp — bit-identical to DuckDB's
        # own nanos→micros truncation.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works 1:1 with
    the DuckDB oracle's pre-registered views."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
