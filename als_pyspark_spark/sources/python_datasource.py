"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-ratings generator, partitioned by user block.

The reference's only input is a ratings text file parsed by hand
(reference ALS.py:585-596). This is the Spark-4-native way to own a source:
implement DataSource/DataSourceReader, declare partitions() so the scan
parallelizes (one InputPartition per user block — the reader-side analogue
of the reference's user-block grid, SURVEY.md §2.4 X1), and let each
partition generate its slice independently.

Everything is closed-form arithmetic — no RNG state — so the SAME rows are
expressible in SQL over generate_series, giving the custom source an EXACT
DuckDB oracle (rare for a source connector, and exactly why the generator
avoids random()).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_USERS = 120
_ITEMS_PER_USER = 25
_N_ITEMS = 60
_USERS_PER_BLOCK = 30


class _RatingsPartition(InputPartition):
    def __init__(self, user_lo: int, user_hi: int):
        self.user_lo = user_lo
        self.user_hi = user_hi


class SyntheticRatingsReader(DataSourceReader):
    def partitions(self):
        return [
            _RatingsPartition(lo, min(lo + _USERS_PER_BLOCK, _USERS))
            for lo in range(0, _USERS, _USERS_PER_BLOCK)
        ]

    def read(self, partition: _RatingsPartition):
        for u in range(partition.user_lo, partition.user_hi):
            for i in range(_ITEMS_PER_USER):
                item = (u + i * 3) % _N_ITEMS
                rating = ((u * 31 + i * 17) % 50) / 10.0
                yield (u, item, rating)


class SyntheticRatingsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ratings"

    def schema(self) -> str:
        return "user bigint, item bigint, rating double"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticRatingsReader()


# SQL twin of read(): same closed-form arithmetic over generate_series.
SYNTHETIC_RATINGS_SQL = f"""
SELECT CAST(u AS BIGINT) AS user,
       CAST((u + i * 3) % {_N_ITEMS} AS BIGINT) AS item,
       ((u * 31 + i * 17) % 50) / 10.0 AS rating
FROM generate_series(0, {_USERS - 1}) AS gu(u),
     generate_series(0, {_ITEMS_PER_USER - 1}) AS gi(i)
"""


def register(spark) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(SyntheticRatingsSource)


def _queries():
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from als_pyspark_spark.registry import query

    @query(
        "q_python_datasource_scan",
        oracle=SYNTHETIC_RATINGS_SQL,
        tags=("source", "python-datasource"),
    )
    def q_python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Full scan of the custom Python data source — every generated row
        must equal the SQL twin exactly (sf_dir unused: the source is its
        own data)."""
        register(spark)
        return spark.read.format("synthetic_ratings").load()

    @query(
        "q_python_datasource_agg",
        oracle=f"""
WITH r AS ({SYNTHETIC_RATINGS_SQL})
SELECT item,
       COUNT(*) AS n,
       CAST(SUM(CAST(rating AS DECIMAL(6,1))) AS DOUBLE) AS rating_sum
FROM r GROUP BY item
""",
        tags=("source", "python-datasource", "agg"),
    )
    def q_python_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Aggregate over the custom source: the scan parallelizes across
        the source's InputPartitions and feeds a normal partial+final
        hash aggregate — a custom source is a first-class scan node."""
        register(spark)
        r = spark.read.format("synthetic_ratings").load()
        return r.groupBy("item").agg(
            F.count("*").alias("n"),
            F.sum(F.col("rating").cast("decimal(6,1)")).cast("double").alias("rating_sum"),
        )


_queries()


class SyntheticRatingsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of SyntheticRatingsReader: each micro-batch delivers
    one user block (the same closed-form rows, one block per offset step),
    so the drained stream is exactly the batch scan. Offsets are plain
    dicts {"u": next_user} — restart-safe resume is the offset contract,
    and readBetweenOffsets replays any committed range deterministically
    (the replayability a production source must provide for exactly-once).
    """

    def initialOffset(self):
        return {"u": 0}

    def _rows(self, lo: int, hi: int):
        for u in range(lo, hi):
            for i in range(_ITEMS_PER_USER):
                item = (u + i * 3) % _N_ITEMS
                rating = ((u * 31 + i * 17) % 50) / 10.0
                yield (u, item, rating)

    def read(self, start):
        u = start["u"]
        if u >= _USERS:
            return (iter([]), start)
        hi = min(u + _USERS_PER_BLOCK, _USERS)
        # list-backed iterator: the runner copy.copy()s cached batch
        # iterators for replay, which generators don't support
        return (iter(list(self._rows(u, hi))), {"u": hi})

    def readBetweenOffsets(self, start, end):
        return iter(list(self._rows(start["u"], end["u"])))


class SyntheticRatingsStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ratings_stream"

    def schema(self) -> str:
        return "user bigint, item bigint, rating double"

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return SyntheticRatingsStreamReader()


def _stream_queries():
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from als_pyspark_spark.registry import query

    @query(
        "q_python_stream_datasource",
        oracle=f"""
WITH r AS ({SYNTHETIC_RATINGS_SQL})
SELECT user,
       COUNT(*) AS n,
       CAST(SUM(CAST(rating AS DECIMAL(6,1))) AS DOUBLE) AS rating_sum
FROM r GROUP BY user
""",
        tags=("source", "python-datasource", "streaming"),
    )
    def q_python_stream_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Custom STREAMING Python DataSource (SimpleDataSourceStreamReader):
        the synthetic ratings arrive one user-block per micro-batch, drain
        into a memory sink (processAllAvailable — the bounded-source drain;
        availableNow only takes one simple-reader batch), and the drained
        rows aggregate to exactly the batch SQL twin — proving the offset
        walk covered every block exactly once."""
        spark.dataSource.register(SyntheticRatingsStreamSource)
        name = "mem_python_stream_datasource"
        spark.catalog.dropTempView(name) if spark.catalog.tableExists(name) else None
        stream = spark.readStream.format("synthetic_ratings_stream").load()
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        drained = spark.table(name)
        return drained.groupBy("user").agg(
            F.count("*").alias("n"),
            F.sum(F.col("rating").cast("decimal(6,1)")).cast("double").alias("rating_sum"),
        )


_stream_queries()


# ---------------------------------------------------------------------------
# Writer side of the DataSource API: a JSON-lines sink with per-partition
# task files and a commit protocol — the minimal shape of every custom sink
# (JDBC batcher, upsert writer, multi-table fan-out).


class _WroteFile(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class JsonlScratchWriter(DataSourceWriter):
    """One output file per task; commit() publishes a manifest. Values are
    integers/strings only (cents, not float dollars) so the text round-trip
    is lossless — the float-through-text trap the sinks module documents."""

    def __init__(self, options):
        self.dir = options["path"]

    def write(self, iterator) -> WriterCommitMessage:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        path = os.path.join(self.dir, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _WroteFile(path)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = os.path.join(self.dir, "_MANIFEST.json")
        with open(manifest, "w") as f:
            json.dump(sorted(m.path for m in messages), f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlScratchSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_scratch"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return JsonlScratchWriter(self.options)


def _writer_queries():
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from als_pyspark_spark.registry import query
    from als_pyspark_spark.sources.tables import load_table

    @query(
        "q_python_datasource_write",
        oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY o_orderstatus
""",
        tags=("source", "python-datasource", "writer"),
    )
    def q_python_datasource_write(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Custom Python DataSource WRITER (the df.write.format() side of
        the API): stream orders through per-task JSON-lines files with a
        commit manifest, read the committed files back, and aggregate —
        exact only if the task/commit protocol loses and duplicates
        nothing. Money travels as integer cents (lossless through text).

        The write is partition-parallel (one file per task, like every
        distributed sink); commit runs once on the driver with the task
        messages — the two-phase shape real sinks (Iceberg/Delta commit
        protocols) build on. The read-back loads EXACTLY the files listed
        in the commit manifest (never a directory glob), so orphan files
        from a crashed-then-retried task — which the Python DataSource API
        cannot clean per-task; abort() only runs on whole-job abort — can
        never be double-counted: the manifest IS the committed snapshot,
        the same read-path contract as Iceberg/Delta manifest lists."""
        import json
        import os
        import shutil

        spark.dataSource.register(JsonlScratchSink)
        from als_pyspark_spark.sources.sinks import app_scratch

        out = app_scratch(spark, "python_datasource_write")
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        o.write.format("jsonl_scratch").option("path", out).mode("append").save()
        with open(os.path.join(out, "_MANIFEST.json")) as f:
            committed = json.load(f)
        back = spark.read.schema(
            "o_orderkey bigint, o_orderstatus string, cents bigint"
        ).json(committed)
        return back.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )

    return q_python_datasource_write


_writer_queries()


class JsonlStreamScratchWriter(DataSourceStreamWriter):
    """Streaming flavor of JsonlScratchWriter: one file per task per
    micro-batch; commit(messages, batchId) publishes a PER-BATCH manifest
    (``_BATCH-<id>.json``) listing exactly that batch's committed files —
    the micro-log a streaming table format (Delta/Iceberg commit per
    batch) is built from. abort() removes the batch's files so a failed
    batch leaves no committed trace."""

    def __init__(self, options):
        self.dir = options["path"]

    def write(self, iterator) -> WriterCommitMessage:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        path = os.path.join(self.dir, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
        return _WroteFile(path)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = os.path.join(self.dir, f"_BATCH-{batchId:05d}.json")
        with open(manifest, "w") as f:
            json.dump(sorted(m.path for m in messages if m is not None), f)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlStreamScratchSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_stream_scratch"

    def streamWriter(self, schema: StructType, overwrite: bool):
        return JsonlStreamScratchWriter(self.options)


def _stream_writer_queries():
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from als_pyspark_spark.registry import query

    @query(
        "q_python_stream_datasource_sink",
        oracle="""
WITH t0 AS (
    SELECT MAX(ts) - INTERVAL 6 DAY AS v FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(
           (CASE WHEN COUNT(CASE WHEN ts <  (SELECT v FROM t0) THEN 1 END) > 0
                 THEN 1 ELSE 0 END)
         + (CASE WHEN COUNT(CASE WHEN ts >= (SELECT v FROM t0) THEN 1 END) > 0
                 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_batches
FROM events
GROUP BY event_type
""",
        tags=("source", "python-datasource", "streaming", "sink"),
    )
    def q_python_stream_datasource_sink(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Custom Python STREAMING sink (DataSourceStreamWriter) — the
        last quadrant of the Python DataSource surface (batch read/write
        and stream read are covered elsewhere in this module). A
        two-micro-batch drain (stage_events_two_batches) writes events
        through per-task JSONL files with a PER-BATCH commit manifest;
        the read-back loads exactly the files each batch manifest lists
        (never a directory glob — the Delta/Iceberg log-is-the-table
        contract, same as q_python_datasource_write) and tags rows with
        their batch id.

        Exactness: per-type counts and integer-cent totals must equal the
        batch oracle (the commit protocol lost and duplicated nothing),
        and ``n_batches`` — distinct batch manifests containing the type —
        must match the oracle's independent derivation from the split
        boundary, witnessing that the sink really committed once per
        micro-batch. 100 TB shape: write is partition-parallel per batch,
        commit is one driver-side manifest append per batch — the shape
        every transactional streaming sink shares.
        """
        import glob
        import json
        import os
        import shutil

        from als_pyspark_spark.sources.sinks import app_scratch
        from als_pyspark_spark.streaming.events import (
            read_staged_stream,
            stage_events_two_batches,
        )

        spark.dataSource.register(JsonlStreamScratchSink)
        staged, _t0, schema = stage_events_two_batches(
            spark, sf_dir, "pyds_stream_sink_in"
        )
        out = app_scratch(spark, "pyds_stream_sink_out")
        ckpt = app_scratch(spark, "pyds_stream_sink_ckpt")
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        os.makedirs(out, exist_ok=True)

        rows = read_staged_stream(spark, staged, schema).select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        q = (
            rows.writeStream.format("jsonl_stream_scratch")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        manifests = sorted(glob.glob(os.path.join(out, "_BATCH-*.json")))
        # explicit raise, not `assert` — stripped under python -O
        if len(manifests) < 2:
            raise RuntimeError(f"expected ≥2 batch commits, got {manifests}")
        parts = []
        for i, mpath in enumerate(manifests):
            with open(mpath) as f:
                committed = json.load(f)
            if not committed:
                continue
            parts.append(
                spark.read.schema(
                    "event_id bigint, event_type string, cents bigint"
                )
                .json(committed)
                .withColumn("batch_id", F.lit(i))
            )
        back = parts[0]
        for p in parts[1:]:
            back = back.unionByName(p)
        return back.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("total_cents"),
            F.countDistinct("batch_id").alias("n_batches"),
        )

    return q_python_stream_datasource_sink


_stream_writer_queries()
