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
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
        # drops and TIMESTAMP(MICROS) (no tz → NTZ) in others, so the
        # loader adapts to the file rather than pinning one physical type:
        #   - nanos  → read the raw int64 (nanosAsLong) and truncate with
        #     exact integer division to micros, bit-identical to DuckDB's
        #     own nanos→micros truncation;
        #   - micros NTZ → cast to session-local TIMESTAMP; the session
        #     timezone is pinned UTC above, so the cast is identity on the
        #     underlying micros and matches DuckDB's naive TIMESTAMP.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_ts_physical_type(spark: SparkSession, sf_dir: str):
    """The parquet-level type Spark infers for events.ts (with nanosAsLong
    on): LongType for TIMESTAMP(NANOS) files, TimestampNTZType for
    TIMESTAMP(MICROS) files. Streaming readers need it to pin a matching
    explicit schema (file-source streams cannot infer)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) works 1:1 with
    the DuckDB oracle's pre-registered views."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
