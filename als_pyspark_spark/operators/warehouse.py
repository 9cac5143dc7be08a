"""Warehouse / analytics staples the reference lacks entirely (its only
"query" is the ALS scoring pipeline, reference ALS.py:581-631): SCD Type 2
dimension history, exact z-score outlier detection, discrete-percentile
winsorization, Pareto/ABC classification, an inverted-index build, and
OHLC time bars. Each is a composition of built-in DataFrame ops — no UDFs —
with an exact DuckDB oracle.

Exactness discipline (matches the rest of the repo): money travels as
integer cents (``ROUND(x*100)`` — lossless for the 2-decimal synthetic
prices), second moments as DECIMAL(38,0) (HUGEINT on the DuckDB side), and
every ordering that feeds a pick (row_number, cumulative sum, value-at-rank)
carries a unique tie-break key so both engines resolve ties identically.
Floats in output are only ever *picked* (min/max/first/last), never summed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from als_pyspark_spark.functions.text import tokens
from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table


# Shared SCD2 oracle CTEs: snapshots → change detection → validity
# intervals. Reused by the history build and the point-in-time join.
_SCD2_IVALS_SQL = """
WITH base AS (
    SELECT c_custkey, c_mktsegment AS seg,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
), snaps AS (
    SELECT c_custkey, seg, bal_cents, 1 AS version FROM base
    UNION ALL
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE seg END,
           bal_cents, 2
    FROM base
    UNION ALL
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE seg END,
           CASE WHEN c_custkey % 5 = 0 THEN bal_cents + 1000 ELSE bal_cents END,
           3
    FROM base
), changed AS (
    SELECT c_custkey, seg, bal_cents, version,
           LAG(seg) OVER w AS prev_seg,
           LAG(bal_cents) OVER w AS prev_bal
    FROM snaps
    WINDOW w AS (PARTITION BY c_custkey ORDER BY version)
), hist AS (
    SELECT c_custkey, seg, bal_cents, version AS valid_from
    FROM changed
    WHERE prev_seg IS NULL OR seg <> prev_seg OR bal_cents <> prev_bal
), ivals AS (
    SELECT c_custkey, seg, bal_cents, valid_from,
           LEAD(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from)
               AS valid_to
    FROM hist
)
"""


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SCD2 history: (c_custkey, seg, bal_cents, valid_from,
    valid_to) validity intervals derived from three deterministic
    snapshot versions of ``customer`` (see q_scd2_customer_history)."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    seg2 = F.when(F.col("c_custkey") % 7 == 0, F.lit("MOVED")).otherwise(F.col("seg"))
    bal3 = F.when(F.col("c_custkey") % 5 == 0, F.col("bal_cents") + 1000).otherwise(
        F.col("bal_cents")
    )
    snaps = (
        base.select("c_custkey", "seg", "bal_cents", F.lit(1).alias("version"))
        .unionByName(
            base.select(
                "c_custkey", seg2.alias("seg"), "bal_cents", F.lit(2).alias("version")
            )
        )
        .unionByName(
            base.select(
                "c_custkey", seg2.alias("seg"), bal3.alias("bal_cents"),
                F.lit(3).alias("version"),
            )
        )
    )
    w = Window.partitionBy("c_custkey").orderBy("version")
    hist = (
        snaps.withColumn("prev_seg", F.lag("seg").over(w))
        .withColumn("prev_bal", F.lag("bal_cents").over(w))
        .where(
            F.col("prev_seg").isNull()
            | (F.col("seg") != F.col("prev_seg"))
            | (F.col("bal_cents") != F.col("prev_bal"))
        )
        .select("c_custkey", "seg", "bal_cents", F.col("version").alias("valid_from"))
    )
    w2 = Window.partitionBy("c_custkey").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w2)
    return hist.select(
        "c_custkey", "seg", "bal_cents", "valid_from", valid_to.alias("valid_to")
    )


@query(
    "q_scd2_customer_history",
    oracle=_SCD2_IVALS_SQL
    + """
SELECT c_custkey,
       seg AS c_mktsegment,
       bal_cents AS acctbal_cents,
       valid_from,
       valid_to,
       (valid_to IS NULL) AS is_current
FROM ivals
""",
    tags=("warehouse", "scd2", "window"),
)
def q_scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension build: collapse a series of full dimension
    snapshots into validity intervals ``[valid_from, valid_to)`` with an
    ``is_current`` flag — the standard slowly-changing-dimension load.

    Three snapshot versions are derived deterministically from ``customer``
    (v2 moves every 7th customer's segment, v3 restates every 5th balance),
    then change detection keeps only rows whose tracked attributes differ
    from the previous version (LAG per key) and LEAD closes each interval
    (extracted to ``_scd2_history`` so the point-in-time join reuses it).

    100 TB shape: both windows are partitioned by the dimension's primary
    key — per-key state is the (tiny, bounded) number of snapshot versions,
    so the shuffle is a plain hash exchange on the key with no skew and no
    global ordering. This is exactly how a Delta/Iceberg SCD2 MERGE plans
    its change-detection subquery.
    """
    return _scd2_history(spark, sf_dir).select(
        "c_custkey",
        F.col("seg").alias("c_mktsegment"),
        F.col("bal_cents").alias("acctbal_cents"),
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


@query(
    "q_zscore_outlier_orders",
    oracle="""
WITH c AS (
    SELECT o_orderpriority,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), g AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(cents) AS HUGEINT) AS s,
           SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS ss
    FROM c GROUP BY o_orderpriority
), flagged AS (
    SELECT c.o_orderpriority, c.cents,
           ((g.n * c.cents - g.s) * (g.n * c.cents - g.s) * (g.n - 1)
              > 4 * g.n * (g.n * g.ss - g.s * g.s)) AS is_outlier
    FROM c JOIN g USING (o_orderpriority)
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN is_outlier THEN cents ELSE 0 END) AS BIGINT)
           AS outlier_cents_sum
FROM flagged
GROUP BY o_orderpriority
""",
    tags=("warehouse", "outlier", "agg"),
)
def q_zscore_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection with EXACT arithmetic: flag
    orders whose total price deviates from their priority group's mean by
    more than 2 sample standard deviations — without ever materializing a
    float mean or stddev.  ``|x - mean| > 2·sigma`` is restated over integer
    cents as ``(n·x - s)² · (n-1) > 4 · n · (n·ss - s²)`` (s = sum,
    ss = sum of squares), evaluated in DECIMAL(38,0) on the Spark side and
    HUGEINT on the DuckDB side, so the boolean — and therefore the output
    aggregates — hash-match exactly (the second moments themselves stay
    internal; only BIGINT-safe counts/sums are returned).

    100 TB shape: one partial+final aggregate over the fact table builds
    the 5-row moment table, which broadcasts back onto the fact scan for
    the per-row flag — two passes, zero windows, no skew sensitivity.
    The same moment algebra is the reference's NormalEquation accumulation
    pattern (Solver.py:31-48) applied to anomaly detection.
    """
    c = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    dec = "decimal(38,0)"
    g = c.groupBy("o_orderpriority").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("cents").cast(dec).alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).alias("ss"),
    )
    joined = c.join(F.broadcast(g), "o_orderpriority")
    dev = F.col("n") * F.col("cents").cast(dec) - F.col("s")
    lhs = dev * dev * (F.col("n") - F.lit(1).cast(dec))
    rhs = (
        F.lit(4).cast(dec)
        * F.col("n")
        * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    )
    flagged = joined.withColumn("is_outlier", lhs > rhs)
    return flagged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).alias("n_outliers"),
        F.sum(F.when(F.col("is_outlier"), F.col("cents")).otherwise(0)).alias(
            "outlier_cents_sum"
        ),
    )


@query(
    "q_winsorize_prices",
    oracle="""
WITH c AS (
    SELECT p_brand, p_partkey,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
    FROM part
), ranked AS (
    SELECT p_brand, cents,
           ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY cents, p_partkey)
               AS rn,
           COUNT(*) OVER (PARTITION BY p_brand) AS n
    FROM c
), thresholds AS (
    SELECT p_brand,
           MIN(CASE WHEN rn = ((n * 5 + 99) // 100) THEN cents END) AS lo_cents,
           MIN(CASE WHEN rn = ((n * 95 + 99) // 100) THEN cents END) AS hi_cents
    FROM ranked GROUP BY p_brand
)
SELECT r.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       t.lo_cents, t.hi_cents,
       CAST(SUM(CASE WHEN r.cents < t.lo_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_lo,
       CAST(SUM(CASE WHEN r.cents > t.hi_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_hi,
       CAST(SUM(LEAST(GREATEST(r.cents, t.lo_cents), t.hi_cents)) AS BIGINT)
           AS winsorized_sum_cents
FROM ranked r JOIN thresholds t USING (p_brand)
GROUP BY r.p_brand, t.lo_cents, t.hi_cents
""",
    tags=("warehouse", "winsorize", "percentile", "window"),
)
def q_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand winsorization at the discrete p5/p95: clip retail prices
    into ``[value@rank ceil(.05n), value@rank ceil(.95n)]`` and report the
    clipped aggregate.  The feature-preprocessing staple for taming heavy
    tails before model training.

    Discrete (value-at-rank) percentiles are used instead of interpolated
    ones so both engines pick an actual data value — rank arithmetic is
    pure integers (``(n·p + 99) // 100``) and the rank ordering carries the
    partkey tie-break, making the thresholds bit-identical.

    100 TB shape: ranking windows are partitioned by brand (dimension-
    bounded groups); the per-brand threshold table is tiny and broadcast
    back. At fact-table scale you would swap exact ranks for
    ``approx_percentile`` — registered separately as
    ``q_approx_percentile_sketch`` with its error-bound witness.
    """
    c = load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("p_brand").orderBy("cents", "p_partkey")
    ranked = c.select(
        "p_brand",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("p_brand")).alias("n"),
    )
    lo_rank = F.floor((F.col("n") * 5 + 99) / 100)
    hi_rank = F.floor((F.col("n") * 95 + 99) / 100)
    thresholds = ranked.groupBy("p_brand").agg(
        F.min(F.when(F.col("rn") == lo_rank, F.col("cents"))).alias("lo_cents"),
        F.min(F.when(F.col("rn") == hi_rank, F.col("cents"))).alias("hi_cents"),
    )
    j = ranked.join(F.broadcast(thresholds), "p_brand")
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents"))
    return j.groupBy("p_brand", "lo_cents", "hi_cents").agg(
        F.count("*").alias("n_parts"),
        F.sum(F.when(F.col("cents") < F.col("lo_cents"), 1).otherwise(0)).alias(
            "n_clipped_lo"
        ),
        F.sum(F.when(F.col("cents") > F.col("hi_cents"), 1).otherwise(0)).alias(
            "n_clipped_hi"
        ),
        F.sum(clipped).alias("winsorized_sum_cents"),
    ).select(
        "p_brand", "n_parts", "lo_cents", "hi_cents",
        "n_clipped_lo", "n_clipped_hi", "winsorized_sum_cents",
    )


@query(
    "q_pareto_abc_parts",
    oracle="""
WITH rev AS (
    SELECT l.l_partkey, p.p_brand,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS rev_e4
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY l.l_partkey, p.p_brand
), ranked AS (
    SELECT p_brand, rev_e4,
           SUM(rev_e4) OVER (PARTITION BY p_brand
                             ORDER BY rev_e4 DESC, l_partkey
                             ROWS UNBOUNDED PRECEDING) AS cum_rev,
           SUM(rev_e4) OVER (PARTITION BY p_brand) AS total_rev
    FROM rev
), classed AS (
    SELECT p_brand, rev_e4,
           CASE WHEN cum_rev * 100 <= total_rev * 80 THEN 'A'
                WHEN cum_rev * 100 <= total_rev * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
)
SELECT p_brand, abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_e4) AS BIGINT) AS class_rev_e4
FROM classed
GROUP BY p_brand, abc_class
""",
    tags=("warehouse", "pareto", "window"),
)
def q_pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: within each brand, rank parts
    by revenue and bucket them A (first 80% of cumulative revenue),
    B (80-95%), C (tail) — the merchandising 80/20 analysis.

    Revenue is exact in 10⁻⁴-dollar units (``cents × (100 - discount%)``,
    lossless for 2-decimal prices and discounts), cumulative shares compare
    as cross-multiplied integers (``cum·100 ≤ total·80``) so no division
    ever happens, and the running sum's frame carries the partkey
    tie-break.

    100 TB shape: the fact-side revenue rollup is the only big shuffle
    (partial+final on partkey); the running-sum window partitions by brand
    over the *aggregated* part rows — dimension-bounded, never fact-sized.

    Magnitude bound (documented like q_corr_covar_exact): brand count is
    fixed, so per-brand cumulative revenue grows with SF — ``cum·100``
    stays within int64 through ~SF 300 (≈2.4e17·100 vs 9.2e18); beyond
    that, lift ``cum100``/``total_rev`` to DECIMAL(38,0) on both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev_row = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    rev = (
        l.join(p.select("p_partkey", "p_brand"), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "p_brand")
        .agg(F.sum(rev_row).alias("rev_e4"))
    )
    w_cum = (
        Window.partitionBy("p_brand")
        .orderBy(F.desc("rev_e4"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("p_brand")
    classed = rev.select(
        "p_brand",
        "rev_e4",
        (F.sum("rev_e4").over(w_cum) * 100).alias("cum100"),
        F.sum("rev_e4").over(w_tot).alias("total_rev"),
    ).select(
        "p_brand",
        "rev_e4",
        F.when(F.col("cum100") <= F.col("total_rev") * 80, "A")
        .when(F.col("cum100") <= F.col("total_rev") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("p_brand", "abc_class").agg(
        F.count("*").alias("n_parts"),
        F.sum("rev_e4").alias("class_rev_e4"),
    )


@query(
    "q_inverted_index_tokens",
    oracle="""
WITH exploded AS (
    SELECT UNNEST(string_split(text, ' ')) AS tok, doc_id FROM documents
), pairs AS (
    SELECT DISTINCT tok, doc_id FROM exploded
), tf AS (
    SELECT tok, COUNT(*) AS tf FROM exploded GROUP BY tok
), inv AS (
    SELECT p.tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_slice(list_sort(list(p.doc_id)), 1, 8), ',')
               AS postings
    FROM pairs p GROUP BY p.tok
)
SELECT i.tok, i.df, CAST(t.tf AS BIGINT) AS tf, i.postings
FROM inv i JOIN tf t USING (tok)
ORDER BY i.df DESC, i.tok
LIMIT 50
""",
    tags=("text", "inverted-index", "topk"),
)
def q_inverted_index_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build over the document corpus: per token, document
    frequency, total term frequency, and the head of the sorted posting
    list — the core structure behind every search/retrieval system and the
    exact-match complement of the BM25 query (``q_bm25_retrieval``).

    Top-50 tokens by (df DESC, token) keep the result stable; posting
    lists are truncated to their first 8 sorted doc ids and serialized to
    one comma-joined STRING on BOTH sides (Spark ``concat_ws`` ↔ DuckDB
    ``array_to_string``) — the driver's pandas canonicalizer cannot sort
    list-valued cells, so every registered query's output schema is
    scalar-only (enforced by test_registry.py's output-schema lint).

    100 TB shape: distinct (token, doc) pairs and the df/tf rollups are
    partial+final aggregates on the token key (partial aggregation absorbs
    within-document repetition before the shuffle); skewed head tokens are
    exactly what AQE skew-split handles. A production index would cap each
    posting list with a per-token top-k window instead of collecting it
    whole — here collect+slice keeps the oracle exact at test scale.
    """
    d = load_table(spark, sf_dir, "documents")
    exploded = d.select(F.explode(tokens(F.col("text"))).alias("tok"), "doc_id")
    pairs = exploded.distinct()
    tf = exploded.groupBy("tok").agg(F.count("*").alias("tf"))
    inv = pairs.groupBy("tok").agg(
        F.count("*").alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 8),
                lambda x: x.cast("string"),
            ),
        ).alias("postings"),
    )
    return (
        inv.join(tf, "tok")
        .select("tok", "df", "tf", "postings")
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(50)
    )


@query(
    "q_ohlc_hourly_bars",
    oracle="""
WITH b AS (
    SELECT event_type,
           date_trunc('hour', ts) AS bucket_hour,
           value,
           ROW_NUMBER() OVER w AS rn_asc,
           COUNT(*) OVER (PARTITION BY event_type, date_trunc('hour', ts))
               AS n_bucket
    FROM events
    WINDOW w AS (PARTITION BY event_type, date_trunc('hour', ts)
                 ORDER BY ts, event_id)
)
SELECT event_type, bucket_hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(CASE WHEN rn_asc = 1 THEN value END) AS open_value,
       MAX(value) AS high_value,
       MIN(value) AS low_value,
       MIN(CASE WHEN rn_asc = n_bucket THEN value END) AS close_value
FROM b
GROUP BY event_type, bucket_hour
""",
    tags=("events", "ohlc", "window", "timeseries"),
)
def q_ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time bars: per (event type, hour), the opening, highest,
    lowest, and closing ``value`` — the financial candlestick rollup, and
    the general first/last-in-window downsampling shape for sensor or
    metric streams.

    Open/close are resolved by row_number with the (ts, event_id) unique
    tie-break — not ``first()``/``min_by`` on a possibly-tied timestamp —
    so both engines pick the same row; floats are only picked, never
    summed, keeping the result hash-exact. The close is the row at
    ``rn == count`` over the same ASCENDING window (not a second
    descending ranking), so the bucket is sorted exactly once.

    100 TB shape: one window partitioned by (type, hour bucket) — bounded
    per-bucket state, one sort, embarrassingly parallel across buckets;
    the same query runs incrementally as a streaming tumbling window
    (``q_stream_tumbling_hourly``) when the input is unbounded.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts")).alias("bucket_hour")
    b = e.select("event_type", bucket, "value", "ts", "event_id")
    w_asc = Window.partitionBy("event_type", "bucket_hour").orderBy("ts", "event_id")
    w_cnt = Window.partitionBy("event_type", "bucket_hour")
    ranked = b.select(
        "event_type",
        "bucket_hour",
        "value",
        F.row_number().over(w_asc).alias("rn_asc"),
        F.count("*").over(w_cnt).alias("n_bucket"),
    )
    return ranked.groupBy("event_type", "bucket_hour").agg(
        F.count("*").alias("n_events"),
        F.min(F.when(F.col("rn_asc") == 1, F.col("value"))).alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.min(F.when(F.col("rn_asc") == F.col("n_bucket"), F.col("value"))).alias(
            "close_value"
        ),
    )


@query(
    "q_activity_streak_islands",
    oracle="""
WITH months AS (
    SELECT DISTINCT o_custkey,
           EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate)
               AS month_idx
    FROM orders
), grouped AS (
    SELECT o_custkey, month_idx,
           month_idx - ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY month_idx) AS island
    FROM months
), islands AS (
    SELECT o_custkey, island, COUNT(*) AS streak_len
    FROM grouped GROUP BY o_custkey, island
)
SELECT o_custkey,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_months,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak
FROM islands
GROUP BY o_custkey
""",
    tags=("warehouse", "gaps-islands", "window"),
)
def q_activity_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per customer, collapse the months they ordered in
    into consecutive-month streaks via the classic ``month_idx − row_number``
    grouping key, reporting active months, number of streaks, and the
    longest streak — the engagement-streak metric behind retention
    dashboards (and the batch mirror of session windows, which solve the
    same problem on event-time gaps).

    Month indices are exact integers (year·12+month), so island keys,
    streak lengths, and every output column hash-match with no float in
    sight.

    100 TB shape: the distinct collapses the fact table to at most
    |customers|·|months| rows before any window; the row_number window
    partitions by customer with per-partition state bounded by the
    calendar. No global window, no skew hazard beyond the customer key
    itself.
    """
    o = load_table(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("month_idx"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("month_idx")
    grouped = months.select(
        "o_custkey",
        "month_idx",
        (F.col("month_idx") - F.row_number().over(w)).alias("island"),
    )
    islands = grouped.groupBy("o_custkey", "island").agg(
        F.count("*").alias("streak_len")
    )
    return islands.groupBy("o_custkey").agg(
        F.sum("streak_len").alias("n_active_months"),
        F.count("*").alias("n_islands"),
        F.max("streak_len").alias("longest_streak"),
    )


@query(
    "q_constraint_checks",
    oracle="""
SELECT 'orders_orderkey_not_null' AS check_name,
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT)
           AS n_violations
UNION ALL
SELECT 'orders_orderkey_unique',
       CAST((SELECT COALESCE(SUM(cnt - 1), 0) FROM
             (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)) AS BIGINT)
UNION ALL
SELECT 'orders_custkey_references_customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'orders_status_accepted_values',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
UNION ALL
SELECT 'orders_totalprice_positive',
       CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT)
""",
    tags=("warehouse", "quality", "constraints"),
)
def q_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the dbt-test / deequ
    check set): NOT NULL, primary-key uniqueness, referential integrity
    into the dimension, accepted values, and a range rule — each emitted
    as one (check_name, n_violations) row, the contract a pipeline gate
    consumes. Complements ``q_profile_orders`` (which describes the data;
    this one judges it).

    100 TB shape: the null/accepted/range checks fold into per-scan
    conditional aggregates (one pass, no shuffle); uniqueness is a
    partial+final count on the key; referential integrity is a LEFT ANTI
    broadcast of the dimension key set — none of the five checks performs
    worse than the query it guards. A production run unions the check
    rows exactly like this and alerts on any n_violations > 0.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def one(name: str, cnt) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    not_null = one(
        "orders_orderkey_not_null",
        o.agg(F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n")),
    )
    unique = one(
        "orders_orderkey_unique",
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n")),
    )
    ref = one(
        "orders_custkey_references_customer",
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == c.c_custkey,
            "left_anti",
        ).agg(F.count("*").alias("n")),
    )
    accepted = one(
        "orders_status_accepted_values",
        o.agg(
            F.sum(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
            ).alias("n")
        ),
    )
    positive = one(
        "orders_totalprice_positive",
        o.agg(F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("n")),
    )
    return not_null.unionByName(unique).unionByName(ref).unionByName(
        accepted
    ).unionByName(positive)


@query(
    "q_cdc_last_writer_wins",
    oracle="""
WITH base AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), changes AS (
    SELECT o_orderkey, 1 AS seq, 'U' AS op,
           CAST(ROUND(o_totalprice * 105) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, 2, 'U', CAST(ROUND(o_totalprice * 110) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, 3, 'D', NULL
    FROM orders WHERE o_orderkey % 9 = 0
), winners AS (
    SELECT o_orderkey, op, cents
    FROM (SELECT o_orderkey, op, cents,
                 ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC)
                     AS rn
          FROM changes)
    WHERE rn = 1
), applied AS (
    SELECT b.o_orderkey, b.o_orderstatus,
           COALESCE(w.cents, b.cents) AS cents
    FROM base b
    LEFT JOIN winners w ON w.o_orderkey = b.o_orderkey
    WHERE w.op IS NULL OR w.op <> 'D'
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM applied
GROUP BY o_orderstatus
""",
    tags=("warehouse", "cdc", "compaction"),
)
def q_cdc_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction with last-writer-wins semantics: a change feed
    carrying MULTIPLE out-of-order versions per key (two price updates and,
    for some keys, a later delete) is compacted to each key's
    highest-sequence change before being applied to the base snapshot —
    the Debezium-to-table materialization step, and the piece
    ``q_upsert_snapshot`` (single change per key) deliberately leaves out.

    Sequence numbers are unique per key, so the ROW_NUMBER pick is
    deterministic; prices travel as integer cents.

    100 TB shape: compaction is a per-key window over the (change-feed
    sized, not table-sized) stream; the apply is one keyed left join
    against the snapshot — broadcastable when the compacted batch is
    small, AQE-skew-safe otherwise. In Structured Streaming the same
    compaction runs per micro-batch with ``max_by(state, seq)`` state.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    k3 = o.where(F.col("o_orderkey") % 3 == 0)
    changes = (
        k3.select(
            "o_orderkey",
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
            F.round(F.col("o_totalprice") * 105).cast("long").alias("cents"),
        )
        .unionByName(
            k3.select(
                "o_orderkey",
                F.lit(2).alias("seq"),
                F.lit("U").alias("op"),
                F.round(F.col("o_totalprice") * 110).cast("long").alias("cents"),
            )
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 9 == 0).select(
                "o_orderkey",
                F.lit(3).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("long").alias("cents"),
            )
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    winners = (
        changes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", "op", F.col("cents").alias("w_cents"))
    )
    applied = (
        base.join(winners, "o_orderkey", "left")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "o_orderstatus",
            F.coalesce("w_cents", "cents").alias("cents"),
        )
    )
    return applied.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )


@query(
    "q_revenue_trend_ols",
    oracle="""
WITH monthly AS (
    SELECT n.n_name,
           (EXTRACT(YEAR FROM o.o_orderdate) - 1990) * 12
               + EXTRACT(MONTH FROM o.o_orderdate) AS x,
           SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // 100) AS y
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name, x
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
FROM monthly
GROUP BY n_name
""",
    tags=("warehouse", "regression", "agg"),
)
def q_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact least-squares revenue trend per nation: the OLS slope of
    monthly revenue over a month index, returned as the integer FRACTION
    ``slope_num / slope_den`` (``n·Σxy − Σx·Σy`` over ``n·Σx² − (Σx)²``)
    instead of a float — no division ever executes, so the regression is
    hash-exact. The normal-equation moment accumulation is the reference's
    Gramian/A4 pattern (ALS.py:562-578, Solver.py:31-48) in its simplest
    1-feature form, distributed as one partial+final aggregate.

    Magnitudes: y is whole dollars (cents DIV 100 — an exact integer
    step), x a recentred month index (< ~10³), so ``n·Σxy`` stays within
    int64 up to ~SF 1000 (≈1.3e18 vs the 9.2e18 limit) — the same
    documented bound style as q_corr_covar_exact.

    100 TB shape: fact rows collapse to (nation × month) partials
    map-side; the per-nation moment rollup is dimension-sized. Nothing
    else shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            ((F.year("o_orderdate") - 1990) * 12 + F.month("o_orderdate")).alias("x"),
            F.expr(
                "CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100"
            ).alias("dollars"),
        )
        .groupBy("n_name", "x")
        .agg(F.sum("dollars").alias("y"))
    )
    return monthly.groupBy("n_name").agg(
        F.count("*").alias("n_months"),
        (
            F.count("*") * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        ).alias("slope_num"),
        (
            F.count("*") * F.sum(F.col("x") * F.col("x"))
            - F.sum("x") * F.sum("x")
        ).alias("slope_den"),
    )


@query(
    "q_scd2_point_in_time",
    oracle=_SCD2_IVALS_SQL
    + """
SELECT (1 + o.o_orderkey % 3) AS as_of_version,
       i.seg AS c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders o
JOIN ivals i
  ON i.c_custkey = o.o_custkey
 AND i.valid_from <= (1 + o.o_orderkey % 3)
 AND (i.valid_to IS NULL OR (1 + o.o_orderkey % 3) < i.valid_to)
GROUP BY as_of_version, i.seg
""",
    tags=("warehouse", "scd2", "temporal-join"),
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension lookup: each fact row joins to
    the SCD2 interval that was valid AT ITS OWN effective version — the
    query pattern SCD2 exists to serve, and the leakage-safe way to
    attach dimension attributes to historical facts (today's segment on
    last year's order is exactly the train-serve skew
    ``q_leakage_safe_split`` guards against elsewhere).

    Each order's effective version is derived deterministically
    (``1 + o_orderkey % 3``); the join key is the customer key plus the
    half-open interval containment ``valid_from <= v < valid_to``.

    100 TB shape: the equality key (custkey) bounds the shuffle — the
    interval predicate is a residual filter on the key-matched pairs, of
    which there are at most |versions| per fact row (same plan discipline
    as q_range_join_purchase_context: never a pure theta join). The
    SCD2 history side is dimension-sized and broadcastable.
    """
    o = load_table(spark, sf_dir, "orders")
    ivals = _scd2_history(spark, sf_dir)
    v = (1 + F.col("o_orderkey") % 3).alias("as_of_version")
    facts = o.select(
        "o_custkey",
        v,
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    j = facts.join(
        F.broadcast(ivals),
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("valid_from") <= F.col("as_of_version"))
        & (F.col("valid_to").isNull() | (F.col("as_of_version") < F.col("valid_to"))),
    )
    return j.groupBy("as_of_version", F.col("seg").alias("c_mktsegment")).agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )


@query(
    "q_event_transition_matrix",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type,
       COUNT(*) AS n_transitions
FROM ordered
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
    tags=("events", "markov", "window"),
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each user's
    time-ordered event stream, count every (previous event → next event)
    pair — the Markov-chain estimate behind next-action prediction and
    journey analysis, and the pairwise complement of the strict-ordering
    funnel (``q_funnel_steps``).

    The LAG ordering carries the (ts, event_id) unique tie-break, so both
    engines see identical adjacencies.

    100 TB shape: one window partitioned by user (per-user state = one
    previous row) feeding a partial+final count on the (prev, next) pair —
    the |types|² output is tiny regardless of input scale.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        ordered.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


@query(
    "q_table_checksum",
    oracle="""
WITH rows_hashed AS (
    SELECT ('0x' || substr(MD5(
               CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
               || '|' || o_orderstatus || '|'
               || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
           ), 1, 15))::BIGINT AS h
    FROM orders
)
SELECT 'orders' AS table_name,
       COUNT(*) AS n_rows,
       CAST(BIT_XOR(h) AS BIGINT) AS checksum_xor,
       CAST(MIN(h) AS BIGINT) AS checksum_min,
       CAST(MAX(h) AS BIGINT) AS checksum_max
FROM rows_hashed
""",
    tags=("warehouse", "checksum", "reconciliation"),
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: hash each row's canonical
    serialization (md5 → first 60 bits as int64, the repo's cross-engine
    hash family) and combine with commutative aggregates — BIT_XOR as the
    checksum (overflow-free at any row count, any SF) plus count/min/max.
    Two replicas — or a source table and its migrated copy — match iff
    their fingerprint rows match, with no sorting and no row shipping:
    the anti-entropy check every cross-cluster reconciliation runs.

    Money enters the serialization as integer cents, making the canonical
    string — and therefore the md5 — deterministic on both engines.

    100 TB shape: row hashing fuses into the scan (embarrassingly
    parallel), and the combine is one partial+final aggregate to a single
    row — XOR's associativity/commutativity is exactly what makes the
    map-side partials safe. Zero shuffle beyond the 1-row combine.
    """
    o = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return o.select(h.alias("h")).agg(
        F.lit("orders").alias("table_name"),
        F.count("*").alias("n_rows"),
        F.expr("BIT_XOR(h)").alias("checksum_xor"),
        F.min("h").alias("checksum_min"),
        F.max("h").alias("checksum_max"),
    )


@query(
    "q_incremental_agg_merge",
    oracle="""
WITH split AS (SELECT TIMESTAMP '1996-01-01' AS cut),
old_agg AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           COUNT(*) AS n, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
    FROM orders, split WHERE o_orderdate < cut GROUP BY 1
), delta_agg AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           COUNT(*) AS n, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
    FROM orders, split WHERE o_orderdate >= cut GROUP BY 1
), merged AS (
    SELECT month, SUM(n) AS n, SUM(c) AS c
    FROM (SELECT * FROM old_agg UNION ALL SELECT * FROM delta_agg)
    GROUP BY month
), full_agg AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           COUNT(*) AS n, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
    FROM orders GROUP BY 1
)
SELECT STRFTIME(m.month, '%Y-%m') AS month,
       CAST(m.n AS BIGINT) AS n_orders,
       CAST(m.c AS BIGINT) AS total_cents,
       (m.n = f.n AND m.c = f.c) AS matches_full_recompute
FROM merged m JOIN full_agg f USING (month)
""",
    tags=("warehouse", "incremental", "agg"),
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: yesterday's materialized rollup
    merges with the new partition's delta rollup instead of recomputing
    from scratch — the pattern behind every incrementally-maintained
    summary table (and the user-facing form of the partial+final
    aggregation Catalyst performs inside one query). Count and integer-
    cent sums are MERGEABLE states, so merge(old, delta) must equal the
    full recompute — emitted per month as the ``matches_full_recompute``
    in-row witness (all true), the same self-witnessing style as the
    sketch queries.

    100 TB shape: the delta side scans only the new partition (partition
    pruning on the date cut); the merge shuffles |months| pre-aggregated
    rows, not facts. Averages/variances extend the same way by carrying
    (n, Σx, Σx²) — see q_corr_covar_exact; non-mergeable forms (exact
    median) are exactly the ones that force full recompute.
    """
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1996-01-01").cast("timestamp")
    month = F.date_format(
        F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
    ).alias("month")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def rollup(df: DataFrame) -> DataFrame:
        return df.select(month, cents.alias("cents")).groupBy("month").agg(
            F.count("*").alias("n"), F.sum("cents").alias("c")
        )

    old_agg = rollup(o.where(F.col("o_orderdate") < cut))
    delta_agg = rollup(o.where(F.col("o_orderdate") >= cut))
    merged = (
        old_agg.unionByName(delta_agg)
        .groupBy("month")
        .agg(F.sum("n").alias("n"), F.sum("c").alias("c"))
    )
    full_agg = rollup(o).select(
        "month", F.col("n").alias("fn"), F.col("c").alias("fc")
    )
    return merged.join(full_agg, "month").select(
        "month",
        F.col("n").alias("n_orders"),
        F.col("c").alias("total_cents"),
        ((F.col("n") == F.col("fn")) & (F.col("c") == F.col("fc"))).alias(
            "matches_full_recompute"
        ),
    )


@query(
    "q_latency_percentile_bands",
    oracle="""
WITH b AS (
    SELECT date_trunc('hour', ts) AS bh,
           value,
           ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n
    FROM events
)
SELECT STRFTIME(bh, '%Y-%m-%d %H:%M:%S') AS bucket_hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN value END) AS p50,
       MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN value END) AS p95,
       MIN(CASE WHEN rn = (n * 99 + 99) // 100 THEN value END) AS p99,
       MAX(value) AS p100
FROM b
GROUP BY bh
""",
    tags=("warehouse", "percentile", "observability", "window"),
)
def q_latency_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour p50/p95/p99/p100 bands over the event value — the
    latency-dashboard rollup every observability pipeline computes.
    Discrete (value-at-rank) percentiles with integer rank arithmetic
    (``ceil(n·p/100)`` as ``(n·p + 99) // 100``) and an (value, event_id)
    tie-broken ranking, so every band is an actual data value both
    engines pick identically — floats picked, never interpolated.

    100 TB shape: one window partitioned by the hour bucket (bounded
    per-bucket state, parallel across buckets) folded into the per-bucket
    aggregate. At fact scale you trade the exact rank for the
    approx_percentile sketch — registered with its error-bound witness as
    q_approx_percentile_sketch; this query is its exact-band twin.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts")).alias("bh")
    w_rn = Window.partitionBy("bh").orderBy("value", "event_id")
    w_n = Window.partitionBy("bh")
    ranked = e.select(bucket, "value", "event_id").select(
        "bh",
        "value",
        F.row_number().over(w_rn).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )

    def band(p: int):
        rank = F.floor((F.col("n") * p + 99) / 100)
        return F.min(F.when(F.col("rn") == rank, F.col("value")))

    return ranked.groupBy("bh").agg(
        F.count("*").alias("n_events"),
        band(50).alias("p50"),
        band(95).alias("p95"),
        band(99).alias("p99"),
        F.max("value").alias("p100"),
    ).select(
        F.date_format("bh", "yyyy-MM-dd HH:mm:ss").alias("bucket_hour"),
        "n_events",
        "p50",
        "p95",
        "p99",
        "p100",
    )


@query(
    "q_market_basket_pairs",
    oracle="""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a,
       b.l_partkey AS part_b,
       COUNT(*) AS n_orders_together
FROM items a
JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
ORDER BY n_orders_together DESC, part_a, part_b
LIMIT 20
""",
    tags=("warehouse", "market-basket", "self-join"),
)
def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs bought together in
    one order — the frequent-itemset k=2 pass behind every
    'frequently bought together' feature. The self-join is keyed on the
    ORDER (the equality key bounds the shuffle) with ``part_a < part_b``
    canonicalizing each unordered pair once.

    100 TB shape: pair fan-out is Σ C(items_per_order, 2) — per-order
    basket size is bounded (TPC-H: ≤7), so the join output is a small
    constant times the fact table, and the pair rollup is partial+final.
    A pathological mega-basket is exactly what the q_skew_diagnostics
    check catches before this runs; the k>2 generalization goes through
    frequent-itemset pruning (count k-1 sets first), not bigger joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders_together"))
        .orderBy(F.desc("n_orders_together"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@query(
    "q_multitouch_attribution",
    oracle="""
WITH purchases AS (
    SELECT event_id AS p_id, user_id, ts AS p_ts,
           CAST(ROUND(value * 100) AS BIGINT) AS p_cents
    FROM events WHERE event_type = 'purchase'
), clicks AS (
    SELECT event_id AS c_id, user_id, ts AS c_ts,
           ('0x' || substr(MD5('ch|' || CAST(event_id AS VARCHAR)), 1, 2))
               ::BIGINT % 3 AS channel
    FROM events WHERE event_type = 'click'
), touches AS (
    SELECT p.p_id, p.p_cents, c.channel, c.c_id,
           COUNT(*) OVER (PARTITION BY p.p_id) AS n_touches,
           ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY c.c_ts, c.c_id)
               AS touch_rank
    FROM purchases p
    JOIN clicks c
      ON c.user_id = p.user_id
     AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
     AND c.c_ts < p.p_ts
), credited AS (
    SELECT channel,
           p_cents // n_touches
             + CASE WHEN touch_rank = n_touches
                    THEN p_cents % n_touches ELSE 0 END AS credit_cents
    FROM touches
)
SELECT channel,
       COUNT(*) AS n_touches,
       CAST(SUM(credit_cents) AS BIGINT) AS credited_cents
FROM credited
GROUP BY channel
""",
    tags=("warehouse", "attribution", "range-join"),
)
def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch (linear) marketing attribution: each purchase's value
    splits evenly across all of that user's clicks in the preceding hour,
    by synthetic channel — the fan-out generalization of last-touch
    (``q_asof_last_order_before_event`` is the 1:1 case). Exactness under
    division: every touch gets ``cents DIV n`` and the LAST touch absorbs
    the remainder (``cents MOD n``), so credited cents sum EXACTLY to the
    attributed purchase value — the penny-allocation discipline of
    financial ledgers, hash-exact on both engines. Precondition (same as
    the PageRank fixed-point math): purchase values are non-negative —
    Spark's DIV truncates toward zero while DuckDB's ``//`` floors, and
    the two agree only on non-negative operands (events.value ≥ 0 by the
    fixture's data contract; a refund-bearing feed would route negatives
    through a separate credit pass).

    100 TB shape: the user-key equality bounds the interval-join shuffle
    (same plan contract as q_range_join_purchase_context); the per-
    purchase windows partition by purchase id over the (bounded-lookback)
    touch fan-in, never over the raw event table.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("p_cents"),
    )
    channel = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ch|"), F.col("event_id").cast("string"))), 1, 2
            ),
            16,
            10,
        ).cast("long")
        % 3
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        channel.alias("channel"),
    )
    touches = purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("p_id", "p_cents", "channel", "c_id", "c_ts")
    w_n = Window.partitionBy("p_id")
    w_rank = Window.partitionBy("p_id").orderBy("c_ts", "c_id")
    credited = touches.select(
        "channel",
        "p_cents",
        F.count("*").over(w_n).alias("n_touches"),
        F.row_number().over(w_rank).alias("touch_rank"),
    ).select(
        "channel",
        (
            F.expr("p_cents DIV n_touches")
            + F.when(
                F.col("touch_rank") == F.col("n_touches"),
                F.expr("p_cents % n_touches"),
            ).otherwise(0)
        ).alias("credit_cents"),
    )
    return credited.groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.sum("credit_cents").alias("credited_cents"),
    )


@query(
    "q_ab_test_analysis",
    oracle="""
WITH assigned AS (
    SELECT user_id,
           ('0x' || substr(MD5('exp1|' || CAST(user_id AS VARCHAR)), 1, 2))
               ::BIGINT % 2 AS variant,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
    FROM events
    GROUP BY user_id
), v AS (
    SELECT variant, CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(converted) AS HUGEINT) AS c
    FROM assigned GROUP BY variant
), w AS (
    SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
           MAX(CASE WHEN variant = 0 THEN c END) AS c0,
           MAX(CASE WHEN variant = 1 THEN n END) AS n1,
           MAX(CASE WHEN variant = 1 THEN c END) AS c1
    FROM v
)
SELECT CAST(n0 AS BIGINT) AS n_control,
       CAST(c0 AS BIGINT) AS conv_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       CAST(c1 AS BIGINT) AS conv_treatment,
       CAST((c1 * 1000000) // n1 - (c0 * 1000000) // n0 AS BIGINT) AS lift_ppm,
       (625 * (c0 * n1 - c1 * n0) * (c0 * n1 - c1 * n0) * (n0 + n1)
          > 2401 * n0 * n1 * (c0 + c1) * (n0 + n1 - c0 - c1))
           AS significant_95
FROM w
""",
    tags=("warehouse", "experiment", "ab-test"),
)
def q_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with an EXACT two-proportion z-test: users
    hash-assign to control/treatment (salted md5 — the reproducible
    bucketing every experimentation platform uses), conversion = any
    purchase event, and the 95% significance flag evaluates
    ``|z| > 1.96`` with ZERO floating point: z² > 3.8416 is
    cross-multiplied to ``625·(c0·n1 − c1·n0)²·N > 2401·n0·n1·C·(N−C)``
    — integers end to end (DECIMAL(38,0) on Spark, HUGEINT on DuckDB),
    so the verdict — the thing an experiment gate acts on — hash-matches
    exactly. Lift is emitted in ppm via integer division.

    Magnitude bound (documented like q_corr_covar_exact): the squared
    term reaches ~4e32 at SF 1000 user counts; the product stays within
    DECIMAL(38,0)/HUGEINT through ~SF 20 — past that, run the test on
    the per-variant aggregate in a float z-test (counts stay exact; only
    the flag needs floats at that scale).

    100 TB shape: one pass over events (groupBy user with a max-flag —
    partial aggregation collapses per-user events map-side), then a
    2-row rollup and a single-row pivot. The heavy lifting is the
    per-user collapse, which is the minimum any experiment readout pays.
    """
    e = load_table(spark, sf_dir, "events")
    variant = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp1|"), F.col("user_id").cast("string"))), 1, 2
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    assigned = (
        e.select("user_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "converted"
            )
        )
        .select(variant.alias("variant"), "converted")
    )
    dec = "decimal(38,0)"
    v = assigned.groupBy("variant").agg(
        F.count("*").cast(dec).alias("n"), F.sum("converted").cast(dec).alias("c")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("c1"),
    )
    d = F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0")
    lhs = F.lit(625).cast(dec) * d * d * (F.col("n0") + F.col("n1"))
    rhs = (
        F.lit(2401).cast(dec)
        * F.col("n0")
        * F.col("n1")
        * (F.col("c0") + F.col("c1"))
        * (F.col("n0") + F.col("n1") - F.col("c0") - F.col("c1"))
    )
    return w.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("c0").cast("long").alias("conv_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        F.col("c1").cast("long").alias("conv_treatment"),
        (
            F.expr("CAST(c1 * 1000000 AS BIGINT) DIV CAST(n1 AS BIGINT)")
            - F.expr("CAST(c0 * 1000000 AS BIGINT) DIV CAST(n0 AS BIGINT)")
        ).alias("lift_ppm"),
        (lhs > rhs).alias("significant_95"),
    )


@query(
    "q_recency_weighted_engagement",
    oracle="""
WITH anchor AS (
    SELECT MAX(ts) AS max_ts FROM events
), scored AS (
    SELECT e.user_id,
           CAST(ROUND(e.value * 100) AS BIGINT)
               // CAST(POW(2, LEAST(30, CAST(date_diff('day', e.ts, a.max_ts)
                                             AS BIGINT) // 7)) AS BIGINT)
               AS decayed_cents
    FROM events e, anchor a
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(decayed_cents) AS BIGINT) AS engagement_score
FROM scored
GROUP BY user_id
""",
    tags=("warehouse", "feature-engineering", "decay"),
)
def q_recency_weighted_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score: each event's value decays by
    half per week of age (relative to the corpus's newest event), summed
    per user — the exponential-decay feature every churn/propensity model
    consumes, usually computed with floats and therefore usually
    non-reproducible. Here the decay is EXACT: weight 2^-w applied as
    integer division by a power of two (exponent clamped at 30), so the
    feature is bit-stable across engines, runs, and row orders.

    100 TB shape: the single-row MAX(ts) anchor broadcasts onto the scan
    (never a window), the decay is per-row arithmetic, and the per-user
    rollup is partial+final. Incremental maintenance composes with
    q_incremental_agg_merge by keeping per-(user, week) partials and
    re-weighting on read.
    """
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("max_ts"))
    scored = e.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.expr(
            "CAST(ROUND(value * 100) AS BIGINT) DIV "
            "CAST(POW(2, LEAST(30, CAST(datediff(max_ts, ts) AS BIGINT) DIV 7)) AS BIGINT)"
        ).alias("decayed_cents"),
    )
    return scored.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("decayed_cents").alias("engagement_score"),
    )


@query(
    "q_benford_digit_profile",
    oracle="""
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
               AS BIGINT) AS first_digit
    FROM orders WHERE o_totalprice > 0
), tot AS (SELECT COUNT(*) AS n FROM digits)
SELECT d.first_digit,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST((COUNT(*) * 1000000) // t.n AS BIGINT) AS observed_ppm,
       CAST(CASE d.first_digit
            WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
            WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
            WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757
            END AS BIGINT) AS benford_ppm
FROM digits d, tot t
GROUP BY d.first_digit, t.n
""",
    tags=("warehouse", "benford", "quality"),
)
def q_benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals: observed
    leading-digit frequencies (ppm, integer cross-division) beside the
    Benford expectation (log10(1+1/d), precomputed as exact ppm
    literals) — the forensic-accounting / synthetic-data smell test. A
    fabricated or truncated money column shows up as a digit profile far
    from the expectation; the comparison itself is left to the consumer
    since 'far' is a policy choice (TPC-H-ish uniforms, for instance,
    deliberately fail Benford).

    First digits are extracted from the integer-cents STRING — no
    logarithms, no floats — so the profile is hash-exact.

    100 TB shape: per-row string head + one partial+final count per
    digit, with the single-row total broadcast for the ppm division —
    the same ≤9-row output at any scale.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(F.count("*").alias("n_values"))
    tot = counts.agg(F.sum("n_values").alias("n"))
    benford = F.create_map(
        *[
            x
            for d, ppm in [
                (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
                (6, 66947), (7, 57992), (8, 51153), (9, 45757),
            ]
            for x in (F.lit(d), F.lit(ppm))
        ]
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "first_digit",
        "n_values",
        F.expr("(n_values * 1000000) DIV n").alias("observed_ppm"),
        benford[F.col("first_digit")].cast("long").alias("benford_ppm"),
    )


@query(
    "q_target_encoding_loo",
    oracle="""
WITH c AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), g AS (
    SELECT o_orderpriority, COUNT(*) AS n, SUM(cents) AS s
    FROM c GROUP BY o_orderpriority
), enc AS (
    SELECT c.o_orderkey, c.o_orderpriority,
           g.s - c.cents AS loo_num,
           g.n - 1 AS loo_den
    FROM c JOIN g USING (o_orderpriority)
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(loo_num % 1000003) AS BIGINT) AS num_residue_sum,
       CAST(MIN(loo_num) AS BIGINT) AS min_num,
       CAST(MAX(loo_num) AS BIGINT) AS max_num,
       CAST(MIN(loo_den) AS BIGINT) AS loo_den
FROM enc
GROUP BY o_orderpriority
""",
    tags=("warehouse", "feature-engineering", "target-encoding"),
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each row's category feature is the
    mean target of its group EXCLUDING the row itself — the standard
    leakage-corrected categorical encoding (naive target encoding leaks
    each row's own label into its feature; LOO removes it, the same
    train-serve-hygiene theme as q_leakage_safe_split and
    q_scd2_point_in_time). The encoding is carried as the exact integer
    fraction ``(Σ − x) / (n − 1)`` — no division executes — and the
    per-group summary folds every row's numerator through a modular
    residue so the driver row witnesses ALL per-row encodings, not just
    the extremes.

    100 TB shape: identical to the z-score pass — one partial+final
    group aggregate broadcast back onto the scan; the encoding adds zero
    shuffles beyond the rollup it needs anyway.
    """
    c = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = c.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    enc = c.join(F.broadcast(g), "o_orderpriority").select(
        "o_orderpriority",
        (F.col("s") - F.col("cents")).alias("loo_num"),
        (F.col("n") - 1).alias("loo_den"),
    )
    return enc.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("loo_num") % 1000003).alias("num_residue_sum"),
        F.min("loo_num").alias("min_num"),
        F.max("loo_num").alias("max_num"),
        F.min("loo_den").alias("loo_den"),
    )


@query(
    "q_churn_labels",
    oracle="""
WITH firsts AS (
    SELECT user_id, MIN(ts) AS first_ts
    FROM events GROUP BY user_id
), labeled AS (
    SELECT f.user_id,
           COUNT(CASE WHEN e.ts < f.first_ts + INTERVAL 7 DAY
                      THEN 1 END) AS n_first_week,
           MAX(CASE WHEN e.event_type = 'purchase'
                     AND e.ts >= f.first_ts + INTERVAL 7 DAY
                     AND e.ts <  f.first_ts + INTERVAL 7 DAY + INTERVAL 12 HOUR
                    THEN 1 ELSE 0 END) AS retained_label
    FROM firsts f JOIN events e ON e.user_id = f.user_id
    GROUP BY f.user_id
)
SELECT retained_label,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_first_week) AS BIGINT) AS first_week_events
FROM labeled
GROUP BY retained_label
""",
    tags=("warehouse", "labels", "feature-engineering"),
)
def q_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-learning label construction: per user, the
    retained/churned label (a PURCHASE inside the 12-hour outcome window
    opening 7 days after their first event — narrow enough that both
    classes materialize in the dense fixture) beside the first-week activity feature — the
    observation-window / outcome-window split every churn or LTV model
    needs, with the windows anchored per-entity (not calendar-global) so
    the label can never see feature-window data. Summarized as the label
    distribution the training job logs before fitting.

    Interval arithmetic is exact (timestamp + literal INTERVAL, integer
    event counts), so labels hash-match.

    100 TB shape: one MIN-rollup for anchors, one keyed join back onto
    the event scan (the anchor side is user-dimension-sized), one
    conditional aggregate — the per-entity-window pattern that a naive
    per-user window function would do with far more state.
    """
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    j = e.join(F.broadcast(firsts), "user_id")
    wk = F.col("first_ts") + F.expr("INTERVAL 7 DAY")
    outcome_end = F.col("first_ts") + F.expr("INTERVAL 7 DAY") + F.expr(
        "INTERVAL 12 HOUR"
    )
    labeled = j.groupBy("user_id").agg(
        F.count(F.when(F.col("ts") < wk, 1)).alias("n_first_week"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= wk)
                & (F.col("ts") < outcome_end),
                1,
            ).otherwise(0)
        ).alias("retained_label"),
    )
    return labeled.groupBy("retained_label").agg(
        F.count("*").alias("n_users"),
        F.sum("n_first_week").alias("first_week_events"),
    )


@query(
    "q_relational_division",
    oracle="""
WITH all_priorities AS (
    SELECT COUNT(DISTINCT o_orderpriority) AS n_all FROM orders
), spans AS (
    SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_prio,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT CAST(s.n_prio = a.n_all AS BOOLEAN) AS covers_all,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(s.n_orders) AS BIGINT) AS n_orders
FROM spans s CROSS JOIN all_priorities a
GROUP BY covers_all
""",
    tags=("warehouse", "relational-division", "agg"),
)
def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — the textbook 'for all' operator (Codd's ÷):
    which customers have placed orders under EVERY priority class? The
    classic formulations are a double NOT EXISTS or a set-difference;
    the scale-correct one used here is the count-match reduction:
    a customer qualifies iff their DISTINCT-priority count equals the
    divisor's cardinality — one grouped aggregate against a broadcast
    1-row divisor count, no correlated subquery, no row multiplication.

    100 TB shape: one partial+final aggregate on the customer key (the
    distinct-priority count partial-aggregates map-side); the divisor
    cardinality is a 1-row broadcast. The double-NOT-EXISTS form the
    textbooks teach decorrelates to exactly this plan — expressing it
    directly skips relying on the decorrelator.
    """
    o = load_table(spark, sf_dir, "orders")
    n_all = o.agg(F.countDistinct("o_orderpriority").alias("n_all"))
    spans = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count("*").alias("n_orders"),
    )
    return (
        spans.crossJoin(F.broadcast(n_all))
        .groupBy((F.col("n_prio") == F.col("n_all")).alias("covers_all"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
        )
    )


@query(
    "q_incremental_join_maintenance",
    oracle="""
WITH s AS (SELECT TIMESTAMP '1996-01-01' AS cut),
oo AS (SELECT * FROM orders, s WHERE o_orderdate <  cut),
od AS (SELECT * FROM orders, s WHERE o_orderdate >= cut),
lo AS (SELECT * FROM lineitem, s WHERE l_shipdate <  cut),
ld AS (SELECT * FROM lineitem, s WHERE l_shipdate >= cut),
pairs AS (
    SELECT o.o_orderdate, l.l_extendedprice FROM oo o JOIN ld l ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT o.o_orderdate, l.l_extendedprice FROM od o JOIN lo l ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT o.o_orderdate, l.l_extendedprice FROM od o JOIN ld l ON l.l_orderkey = o.o_orderkey
), base AS (
    SELECT STRFTIME(DATE_TRUNC('month', o.o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n, SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS c
    FROM oo o JOIN lo l ON l.l_orderkey = o.o_orderkey GROUP BY 1
), delta AS (
    SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n, SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS c
    FROM pairs GROUP BY 1
), merged AS (
    SELECT month, SUM(n) AS n, SUM(c) AS c
    FROM (SELECT * FROM base UNION ALL SELECT * FROM delta) GROUP BY month
), full_v AS (
    SELECT STRFTIME(DATE_TRUNC('month', o.o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n, SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS c
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey GROUP BY 1
)
SELECT m.month,
       CAST(m.n AS BIGINT) AS n_lineitems,
       CAST(m.c AS BIGINT) AS revenue_cents,
       (m.n = f.n AND m.c = f.c) AS matches_full_recompute
FROM merged m JOIN full_v f USING (month)
""",
    tags=("warehouse", "incremental", "join", "ivm"),
)
def q_incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN view maintenance — the delta-join algebra that
    q_incremental_agg_merge's mergeable-aggregate story needs once the
    materialized view contains a JOIN: with both inputs split into
    (old, delta) by the same cut,

        Δ(O ⋈ L) = ΔO⋈L₀ ∪ O₀⋈ΔL ∪ ΔO⋈ΔL

    — three delta-sided joins whose union, merged into the base view,
    must equal the full recompute (emitted per month as the all-true
    ``matches_full_recompute`` in-row witness). The cross terms are the
    essence: a NEW lineitem can hit an OLD order, which a naive
    "recompute only new partitions" approach silently loses.

    100 TB shape: every delta join has a delta side bounded by the new
    partition (pruned scan), never old⋈old — the view refresh cost is
    O(|Δ|·fanout), not O(|table|); this is the relational core of
    Delta/materialized-view incremental refresh and of streaming
    stream-static enrichment alike.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1996-01-01").cast("timestamp")
    oo = o.where(F.col("o_orderdate") < cut)
    od = o.where(F.col("o_orderdate") >= cut)
    lo = li.where(F.col("l_shipdate") < cut)
    ld = li.where(F.col("l_shipdate") >= cut)

    month = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")

    def rollup(pairs: DataFrame) -> DataFrame:
        return pairs.select(month.alias("month"), cents.alias("cc")).groupBy(
            "month"
        ).agg(F.count("*").alias("n"), F.sum("cc").alias("c"))

    def j(os: DataFrame, ls: DataFrame) -> DataFrame:
        return os.join(ls, os["o_orderkey"] == ls["l_orderkey"]).select(
            "o_orderdate", "l_extendedprice"
        )

    base = rollup(j(oo, lo))
    delta = rollup(
        j(oo, ld).unionByName(j(od, lo)).unionByName(j(od, ld))
    )
    merged = (
        base.unionByName(delta)
        .groupBy("month")
        .agg(F.sum("n").alias("n"), F.sum("c").alias("c"))
    )
    full_v = rollup(j(o, li)).select(
        "month", F.col("n").alias("fn"), F.col("c").alias("fc")
    )
    return merged.join(full_v, "month").select(
        "month",
        F.col("n").alias("n_lineitems"),
        F.col("c").alias("revenue_cents"),
        ((F.col("n") == F.col("fn")) & (F.col("c") == F.col("fc"))).alias(
            "matches_full_recompute"
        ),
    )
