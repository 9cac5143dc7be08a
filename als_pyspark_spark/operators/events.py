"""Batch queries over the events table — the deterministic twins of the
Structured Streaming jobs in streaming/events.py (same windows, same dedup
semantics), so the streaming logic gets an exact DuckDB oracle here and the
streaming tests only have to prove batch≡stream equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table


@query(
    "q_events_tumbling_hourly",
    oracle="""
SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "window", "streaming-twin"),
)
def q_events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate, expressed with the real
    F.window() operator (not date_trunc) — the same expression a
    Structured Streaming job uses with a watermark."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_events_dedup_first",
    oracle="""
SELECT event_id,
       MIN(STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f')) AS first_ts,
       COUNT(*) AS n_occurrences
FROM events
GROUP BY event_id
HAVING COUNT(*) >= 1
""",
    tags=("events", "dedup", "streaming-twin"),
)
def q_events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on event_id keeping the earliest ts — batch twin of
    streaming dropDuplicates(['event_id']) with watermark."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_id").agg(
        F.min(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).alias("first_ts"),
        F.count("*").alias("n_occurrences"),
    )


@query(
    "q_events_user_daily",
    oracle="""
SELECT user_id,
       STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types
FROM events
GROUP BY 1, 2
""",
    tags=("events", "agg"),
)
def q_events_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily activity rollup."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )
