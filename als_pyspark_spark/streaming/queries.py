"""Registry entries that run REAL Structured Streaming jobs.

A file-source stream drained with trigger=availableNow is deterministic, so
the tumbling-window job can carry the SAME DuckDB oracle as its batch twin —
the strongest possible streaming check (not rows-only: the streaming state
machine must reproduce the batch aggregate exactly).

Scale notes: the streamed plan is identical to what a Kafka source would
run — watermark bounds state, window+key is the state-store key. Complete
mode here is for the bounded drain; a production continuous run would use
append mode with the watermark closing windows incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from als_pyspark_spark.registry import query
from als_pyspark_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    streaming_dedup,
    tumbling_hourly,
)


@query(
    "q_stream_tumbling_hourly",
    oracle="""
SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "window", "watermark"),
)
def q_stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate executed AS A STREAM (file source,
    watermark, availableNow drain, memory sink) — and checked against the
    exact batch oracle. Identical results prove the streaming state
    machine matches batch semantics."""
    name = "mem_stream_tumbling_hourly"
    spark.catalog.dropTempView(name) if spark.catalog.tableExists(name) else None
    stream = tumbling_hourly(read_events_stream(spark, sf_dir))
    return run_to_memory(stream, name, mode="complete")


@query("q_stream_dedup_count", oracle=None, tags=("streaming", "dedup", "state"))
def q_stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup (dropDuplicates within watermark) drained
    and reduced to per-type counts. Rows-only: which physical duplicate
    survives is arrival-order-dependent, but the KEY SET is exact —
    asserted against batch in tests/test_streaming.py."""
    from pyspark.sql import functions as F

    name = "mem_stream_dedup_count"
    spark.catalog.dropTempView(name) if spark.catalog.tableExists(name) else None
    stream = streaming_dedup(read_events_stream(spark, sf_dir))
    drained = run_to_memory(stream, name, mode="append")
    return drained.groupBy("event_type").agg(F.count("*").alias("n_unique"))


@query(
    "q_stream_sliding_halfhour",
    oracle="""
WITH both_windows AS (
    SELECT time_bucket(INTERVAL '30 minutes', ts) AS w, event_type FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w, event_type FROM events
)
SELECT STRFTIME(w, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM both_windows
GROUP BY 1, 2
""",
    tags=("streaming", "window", "sliding"),
)
def q_stream_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30min slide) AS A STREAM, exact-oracled:
    every event lands in exactly two windows, which the oracle enumerates
    explicitly (bucket and bucket minus one slide)."""
    from als_pyspark_spark.streaming.events import sliding_counts

    name = "mem_stream_sliding_halfhour"
    spark.catalog.dropTempView(name) if spark.catalog.tableExists(name) else None
    stream = sliding_counts(read_events_stream(spark, sf_dir))
    return run_to_memory(stream, name, mode="complete")
