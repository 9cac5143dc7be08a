"""Sink coverage: parquet (partitioned), CSV, JSON write→read round-trips.

The reference has NO writes at all — its only sink is a driver collect/print
(SURVEY.md §2.1 S3). A real engine needs durable sinks; each query here
writes a derived table to a scratch directory in the requested format, reads
it back, and aggregates — so the oracle (which runs on the ORIGINAL parquet)
only matches if the round-trip is lossless.

Scale notes (100 TB):
- ``partitionBy`` on a low-cardinality column gives partition pruning to
  every downstream reader — the standard layout for fact tables.
- Writers run fully distributed (one file per task per partition value);
  nothing funnels through the driver.
- CSV/JSON carry only exactly-representable values here (ints, strings,
  DECIMAL-derived money) — float round-trip through text is the classic
  lossy trap, so money goes through the text formats as fixed-point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table

_PRICE = "decimal(12,2)"
_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def _scratch(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    return os.path.join(_SCRATCH, name)


def app_scratch(spark: SparkSession, name: str) -> str:
    """Scratch dir scoped by the Spark applicationId: write-then-read
    queries must not share output paths across processes — two concurrent
    gate runs appending/overwriting one directory read each other's files
    (measured: exactly-doubled counts when the pytest gate and the script
    gate overlapped). applicationId is unique per session and stable
    within it, so reruns in one session still reuse/overwrite cleanly.

    Stale siblings from PAST sessions (same name prefix, other appId) are
    garbage-collected once they are over an hour old — old enough that no
    live concurrent process can still be writing them. Staleness is judged
    by the NEWEST mtime anywhere in the directory tree, not the top-level
    dir: a partitioned sink writes into nested partition subdirectories
    whose activity never bumps the parent's mtime, so a parent-only check
    could delete a >1h-old session's scratch dir while its tasks are still
    writing — exactly the cross-process interference this helper exists to
    prevent."""
    import shutil
    import time

    def _tree_mtime(root: str) -> float:
        newest = os.path.getmtime(root)
        for dirpath, dirnames, filenames in os.walk(root):
            for entry in dirnames + filenames:
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(dirpath, entry))
                    )
                except OSError:
                    pass  # raced with a concurrent writer's rename/cleanup
        return newest

    os.makedirs(_SCRATCH, exist_ok=True)
    cutoff = time.time() - 3600
    prefix = f"{name}-"
    mine = f"{name}-{spark.sparkContext.applicationId}"
    for d in os.listdir(_SCRATCH):
        if d.startswith(prefix) and d != mine:
            path = os.path.join(_SCRATCH, d)
            try:
                if _tree_mtime(path) < cutoff:
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                pass
    return _scratch(mine)


@query(
    "q_sink_partitioned_parquet",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
""",
    tags=("sink", "parquet", "partitioned"),
)
def q_sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write 1998+ lineitems partitioned by l_returnflag, read back, agg.

    The read-back scan prunes to partition directories when filtered —
    the layout every 100 TB fact table should have.
    """
    out = app_scratch(spark, "sink_partitioned_parquet")
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l.select("l_orderkey", "l_returnflag", F.col("l_quantity").cast(_PRICE).alias("qty")).write.mode(
        "overwrite"
    ).partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum("qty").cast("double").alias("sum_qty"),
    )


@query(
    "q_sink_csv_roundtrip",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS custkey_sum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
""",
    tags=("sink", "csv"),
)
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent orders → CSV (header, explicit schema on read) → aggregate.
    Money travels as DECIMAL text, ids as longs — lossless by construction."""
    out = app_scratch(spark, "sink_csv_roundtrip")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", F.col("o_totalprice").cast(_PRICE).alias("price")
    ).write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, price DECIMAL(12,2)"
    ).option("header", True).csv(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_custkey").alias("custkey_sum"),
        F.sum("price").cast("double").alias("total_price"),
    )


@query(
    "q_sink_json_roundtrip",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
FROM events
GROUP BY event_type
""",
    tags=("sink", "json"),
)
def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events (id, type, extracted JSON int) → JSON lines → read back → agg.
    Exercises both the JSON sink and get_json_object extraction."""
    out = app_scratch(spark, "sink_json_roundtrip")
    e = load_table(spark, sf_dir, "events")
    e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    ).write.mode("overwrite").json(out)
    back = spark.read.schema("event_id BIGINT, event_type STRING, k BIGINT").json(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("k_sum"),
    )


@query(
    "q_sink_orc_roundtrip",
    oracle="""
SELECT p_brand,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_retail
FROM part
WHERE p_size >= 25
GROUP BY p_brand
""",
    tags=("sink", "orc"),
)
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large parts → ORC (Spark's second columnar format) → read back →
    aggregate. The oracle reads the ORIGINAL parquet, so a match proves the
    ORC round-trip is lossless."""
    out = app_scratch(spark, "sink_orc_roundtrip")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") >= 25)
    p.select("p_partkey", "p_brand", F.col("p_retailprice").cast(_PRICE).alias("retail")).write.mode(
        "overwrite"
    ).orc(out)
    back = spark.read.orc(out)
    return back.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum("retail").cast("double").alias("total_retail"),
    )


@query(
    "q_sink_xml_roundtrip",
    oracle="""
SELECT n_name,
       COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("sink", "xml"),
)
def q_sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers+nation → XML (built into Spark 4) → read back → aggregate.
    Money rides as fixed-point DECIMAL text so the text round-trip is
    lossless; the oracle reads the ORIGINAL parquet, so a match proves it."""
    out = app_scratch(spark, "sink_xml_roundtrip")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name", F.col("s_acctbal").cast(_PRICE).alias("bal")
    )
    joined.write.mode("overwrite").format("xml").option("rootTag", "suppliers").option(
        "rowTag", "supplier"
    ).save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema("s_suppkey bigint, n_name string, bal decimal(12,2)")
        .load(out)
    )
    return back.groupBy("n_name").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("bal").cast("double").alias("total_bal"),
    )


@query(
    "q_sink_sorted_layout",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-09-01 00:00:00'
GROUP BY l_returnflag
""",
    tags=("sink", "parquet", "layout", "zorder"),
)
def q_sink_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned, sort-within-partition data layout — the scan
    locality pattern (linear Z-order) every 100 TB fact table wants:
    ``repartitionByRange(l_shipdate)`` clusters each date range into its
    own files and ``sortWithinPartitions`` orders rows inside them, so
    parquet min/max footer stats become tight and a date-range reader
    skips whole files and row groups instead of scanning the table.
    The read-back applies a 3-month predicate (pushed to the scan —
    PushedFilters on the parquet source) and aggregates; the oracle runs
    the same predicate on the ORIGINAL unsorted table, so a match proves
    the layout rewrite is content-preserving.

    At 100 TB: the rewrite is one range shuffle (AQE-balanced, skew
    handled by range-boundary sampling) paid once at ingestion; every
    downstream time-windowed query then reads only its slice. The same
    two calls generalize to multi-column linear clustering
    (repartitionByRange(colA, colB)).
    """
    out = app_scratch(spark, "sink_sorted_layout")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        "l_shipdate",
        F.col("l_extendedprice").cast("decimal(14,2)").alias("price"),
    )
    (
        l.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).where(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01 00:00:00").cast("timestamp"))
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum("price").cast("double").alias("revenue"),
    )


def _morton_spread(col: str) -> str:
    """SQL expression spreading a 16-bit value's bits to the even bit
    positions of a 32-bit value (the multiply-mask Morton trick) — pure
    integer shifts/masks, so Spark and DuckDB evaluate it bit-identically."""
    x = f"CAST({col} AS BIGINT)"
    x = f"(({x} | ({x} << 8)) & 16711935)"
    x = f"(({x} | ({x} << 4)) & 252645135)"
    x = f"(({x} | ({x} << 2)) & 858993459)"
    x = f"(({x} | ({x} << 1)) & 1431655765)"
    return x


@query(
    "q_zorder_layout_sink",
    oracle="""
WITH z AS (
    SELECT o_custkey % 1024 AS cx,
           DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 1024 AS dy
    FROM orders
), s1 AS (
    SELECT cx, dy,
           (CAST(cx AS BIGINT) | (CAST(cx AS BIGINT) << 8)) & 16711935 AS a,
           (CAST(dy AS BIGINT) | (CAST(dy AS BIGINT) << 8)) & 16711935 AS b
    FROM z
), s2 AS (
    SELECT cx, dy, (a | (a << 4)) & 252645135 AS a, (b | (b << 4)) & 252645135 AS b FROM s1
), s3 AS (
    SELECT cx, dy, (a | (a << 2)) & 858993459 AS a, (b | (b << 2)) & 858993459 AS b FROM s2
), s4 AS (
    SELECT cx, dy, (a | (a << 1)) & 1431655765 AS a, (b | (b << 1)) & 1431655765 AS b FROM s3
), zv AS (
    SELECT cx, dy, (a | (b << 1)) AS zval FROM s4
)
SELECT CAST(zval >> 16 AS BIGINT) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(cx) AS BIGINT) AS min_cust,
       CAST(MAX(cx) AS BIGINT) AS max_cust,
       CAST(MIN(dy) AS BIGINT) AS min_day,
       CAST(MAX(dy) AS BIGINT) AS max_day
FROM zv
GROUP BY 1
""",
    tags=("sink", "parquet", "layout", "zorder", "morton"),
)
def q_zorder_layout_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional Z-ORDER layout (Delta ``OPTIMIZE ZORDER BY``, the
    step beyond q_sink_sorted_layout's linear clustering): customer key
    and order-date day index are bit-interleaved into a Morton code, the
    table is range-partitioned and sorted by that code, and rewritten to
    parquet — so file/row-group min-max stats become tight in BOTH
    dimensions at once and a reader filtering on either column (or a 2-D
    cell) skips most files.

    The returned DataFrame aggregates the READ-BACK layout per top-4-bit
    z-bucket: each bucket's (min,max) envelope in both dimensions is the
    data-skipping witness, and every value is integer (mod, shift, mask),
    so the oracle — which replays the identical interleave on the raw
    table — hash-matches bit-for-bit. A content drop or duplication in
    the rewrite, or a divergent interleave, breaks the match.

    100 TB shape: one range shuffle on the z-value at ingestion (AQE
    balances boundaries), identical cost to any sorted rewrite; the
    payoff is multiplicative scan pruning for every 2-D-selective reader
    after. Dimensions are folded to a 10-bit domain (1024 cells per axis)
    so the top-4-bit buckets quarter BOTH axes — each bucket's envelope
    is ≤¼ of each dimension's range, the stats a reader's 2-D predicate
    prunes against; wider keys compose by dividing first.
    """
    out = app_scratch(spark, "sink_zorder_layout")
    cx = "(o_custkey % 1024)"
    dy = "(DATEDIFF(CAST(o_orderdate AS DATE), DATE '1992-01-01') % 1024)"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(cx).alias("cx"),
        F.expr(dy).alias("dy"),
    )
    z = o.withColumn(
        "zval",
        F.expr(f"{_morton_spread('cx')} | ({_morton_spread('dy')} << 1)"),
    )
    (
        z.repartitionByRange(16, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.groupBy(
        F.expr("zval >> 16").cast("long").alias("z_bucket")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("cx").cast("long").alias("min_cust"),
        F.max("cx").cast("long").alias("max_cust"),
        F.min("dy").cast("long").alias("min_day"),
        F.max("dy").cast("long").alias("max_day"),
    )


@query(
    "q_schema_evolution_read",
    oracle="""
WITH t0 AS (
    SELECT MAX(o_orderdate) - INTERVAL 365 DAY AS v FROM orders
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN o_orderdate >= (SELECT v FROM t0) THEN 1 END)
            AS BIGINT) AS n_with_cents,
       CAST(SUM(CASE WHEN o_orderdate >= (SELECT v FROM t0)
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS total_cents
FROM orders
GROUP BY o_orderstatus
""",
    tags=("source", "parquet", "schema-evolution", "mergeSchema"),
)
def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet SCHEMA EVOLUTION on read (``mergeSchema``): the table's
    history is two file generations — v1 (early year: orderkey + status)
    written before a ``cents`` column existed, v2 (last 365 days) carrying
    it — and one read reconciles them into the union schema with NULL
    back-fill for pre-evolution files. This is the lakehouse add-column
    path every long-lived 100 TB table walks (Delta/Iceberg do the same
    merge from their own metadata; plain parquet needs the footer merge
    exercised here).

    The read-back aggregate counts rows WITH the evolved column per
    status and sums it (integer cents); the oracle derives the same split
    from the time boundary — so a wrong merge (dropped column, misaligned
    back-fill, lost file generation) breaks the hash. The generation
    boundary ``max(o_orderdate) − 365 days`` is SQL-expressible on
    purpose.

    Scale note: mergeSchema=true footer-merges EVERY file's schema at
    planning time — priced as the showcase here; a production 100 TB
    table keeps the union schema in table metadata (Delta/Iceberg) or
    pins it with ``.schema(...)``, paying this cost never.
    """
    out = app_scratch(spark, "schema_evolution")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    t0 = o.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 365 DAYS")).alias("v")
    ).collect()[0]["v"]
    (
        o.where(F.col("o_orderdate") < F.lit(t0))
        .select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(out)
    )
    (
        o.where(F.col("o_orderdate") >= F.lit(t0))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .write.mode("append")
        .parquet(out)
    )
    back = spark.read.option("mergeSchema", "true").parquet(out)
    # explicit raise, not `assert` — stripped under python -O
    if "cents" not in back.columns:
        raise RuntimeError(f"mergeSchema lost the evolved column: {back.columns}")
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.count("cents").alias("n_with_cents"),
        F.sum("cents").alias("total_cents"),
    )


@query(
    "q_json_corrupt_records",
    oracle="""
SELECT CASE WHEN o_orderkey % 7 = 0 THEN '_CORRUPT' ELSE o_orderstatus END
           AS status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey % 7 <> 0
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS total_cents
FROM orders
GROUP BY 1
""",
    tags=("source", "json", "corrupt-record", "permissive"),
)
def q_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input tolerance on ingest: a JSONL feed where every 7th
    order (``o_orderkey % 7 = 0``) is a deterministically TRUNCATED line,
    read back in PERMISSIVE mode with ``columnNameOfCorruptRecord`` — the
    contract real pipelines rely on at 100 TB, where a fraction of any
    feed is always broken and a single bad line must neither kill the job
    (FAILFAST) nor vanish silently (DROPMALFORMED), but land in a
    quarantine column for audit.

    The read-back buckets corrupt rows (all data fields NULL, raw line
    preserved) under '_CORRUPT' beside the parsed per-status totals in
    integer cents; the oracle re-derives both from the corruption rule,
    so a parser that dropped, double-counted, or partially parsed a
    broken line breaks the hash. Scale shape: corruption handling is
    per-row map-side work in the scan itself — no extra pass, no shuffle.
    """
    import shutil

    out = app_scratch(spark, "json_corrupt")
    shutil.rmtree(out, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    lines = o.select(
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.concat(F.lit('{"o_orderkey": '), F.col("o_orderkey"), F.lit(", BROKEN")),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    "o_orderkey",
                    "o_orderstatus",
                    F.round(F.col("o_totalprice") * 100)
                    .cast("long")
                    .alias("cents"),
                )
            )
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(out)
    back = (
        spark.read.schema(
            "o_orderkey bigint, o_orderstatus string, cents bigint, "
            "_corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return (
        back.select(
            F.when(F.col("_corrupt_record").isNotNull(), "_CORRUPT")
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            "cents",
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
    )


@query(
    "q_compact_small_files",
    oracle="""
SELECT CAST(64 AS BIGINT) AS n_files_before,
       CAST(CEIL(COUNT(*) / 2500.0) AS BIGINT) AS n_files_after,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
""",
    tags=("sink", "parquet", "compaction", "optimize"),
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION (Delta ``OPTIMIZE`` / Iceberg rewrite-data-
    files): a deliberately fragmented table — 64 tiny parquet files, the
    classic streaming-ingest pathology whose per-file open/footer/task
    overhead throttles every downstream scan at 100 TB — is rewritten to
    ``ceil(rows / 2500)`` right-sized files, and the read-back must prove
    the rewrite (a) hit the target layout (file counts from the actual
    filesystem, not the plan) and (b) preserved content bit-for-bit
    (row count + integer-cent total vs the raw-table oracle; a dropped
    or doubled file breaks the hash).

    100 TB shape: compaction is one round-robin shuffle of the fragment
    set sized by target file count — in production, per-partition and
    incremental (only fragments below the size threshold rewrite), with
    the same content-preservation invariant this row witnesses. A real
    table format swaps the file list atomically in its log; plain
    parquet stands in here with separate staging and compacted dirs.
    """
    import glob
    import math
    import os
    import shutil

    frag = app_scratch(spark, "compact_frag")
    compacted = app_scratch(spark, "compact_out")
    for d in (frag, compacted):
        shutil.rmtree(d, ignore_errors=True)
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    e.repartition(64).write.mode("overwrite").parquet(frag)
    n_before = len(glob.glob(os.path.join(frag, "part-*")))
    # The oracle hardcodes the 64-fragment precondition; if the fixture is
    # ever too small to fill 64 round-robin partitions (or a writer skips
    # an empty one), fail HERE with a diagnosis instead of surfacing as a
    # spurious hash mismatch downstream.
    if n_before != 64:
        raise RuntimeError(
            f"compaction precondition broken: expected 64 fragment files, "
            f"found {n_before} in {frag} — fixture too small for the "
            f"round-robin fan-out?"
        )

    back = spark.read.parquet(frag)
    n_rows = back.count()
    n_target = math.ceil(n_rows / 2500)
    back.repartition(n_target).write.mode("overwrite").parquet(compacted)
    n_after = len(glob.glob(os.path.join(compacted, "part-*")))
    if n_after != n_target:
        raise RuntimeError(
            f"compaction wrote {n_after} files, target was {n_target} — "
            f"round-robin repartition left an empty partition?"
        )

    return (
        spark.read.parquet(compacted)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            F.lit(n_before).cast("long").alias("n_files_before"),
            F.lit(n_after).cast("long").alias("n_files_after"),
            "n_rows",
            "total_cents",
        )
    )
