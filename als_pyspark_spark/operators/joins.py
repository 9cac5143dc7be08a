"""Join flavors the reference lacks (SURVEY.md §2.3 "Absent" list).

The reference only has inner shuffled-hash joins on pair-RDD keys
(reference ALS.py:158-176, 535-548, 622-624). Catalyst gives the rest:
broadcast, semi, anti, outer, and range/as-of compositions.

Scale notes: semi/anti joins avoid materializing the payload of the probe
side; the as-of join here is expressed as join+argmax which Spark plans as
a shuffled join + partial agg — at 100 TB you'd bound the range condition
(e.g. 90-day lookback) to keep the join selective, which the query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table


@query(
    "q_semi_join_priority_orders",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
)
GROUP BY o_orderpriority
""",
    tags=("join", "semi"),
)
def q_semi_join_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (TPC-H Q4 shape): orders having a high-quantity line."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_anti_join_silent_customers",
    oracle="""
SELECT c.c_mktsegment AS c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
""",
    tags=("join", "anti"),
)
def q_anti_join_silent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers that never ordered, counted per segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "q_outer_join_order_counts",
    oracle="""
SELECT c.c_custkey AS c_custkey,
       COUNT(o.o_orderkey) AS n_orders
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
    tags=("join", "outer"),
)
def q_outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + count that preserves order-less customers as 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_broadcast_nation_rollup",
    oracle="""
SELECT n.n_name AS n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("join", "broadcast"),
)
def q_broadcast_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: 25-row nation dim never shuffles the
    customer fact. Verified BroadcastHashJoin in tests/test_plans.py."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "q_asof_last_order_before_event",
    oracle="""
SELECT e.event_id AS event_id,
       MAX(STRFTIME(o.o_orderdate, '%Y-%m-%d %H:%M:%S')) AS last_orderdate
FROM events e
JOIN orders o
  ON o.o_custkey = e.user_id
 AND o.o_orderdate <= e.ts
 AND o.o_orderdate >= e.ts - INTERVAL 10957 DAY
WHERE e.event_type = 'purchase'
GROUP BY e.event_id
""",
    tags=("join", "asof", "range"),
)
def q_asof_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for each purchase event, the most recent order date of
    that user at event time. Expressed as range join + argmax — Spark has no
    native ASOF, but equi-key + range predicate + max composes it exactly.

    Scale: the equi key (user) carries the shuffle; the range predicate is
    evaluated post-probe. The bounded lookback keeps the per-key fan-out
    O(window) instead of O(full history). The constant is data-dependent:
    this synthetic corpus puts the event clock (2024) ~23 years after the
    order history (1995-2001), so the bound is 30 years to cover the gap —
    on a real corpus it would be days; the predicate SHAPE is what scales.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    o = load_table(spark, sf_dir, "orders")
    return (
        e.join(
            o,
            (o.o_custkey == e.user_id)
            & (o.o_orderdate <= e.ts)
            & (o.o_orderdate >= e.ts - F.expr("INTERVAL 10957 DAYS")),
        )
        .groupBy("event_id")
        .agg(
            F.max(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")).alias(
                "last_orderdate"
            )
        )
    )


@query(
    "q_self_join_same_day_orders",
    oracle="""
SELECT a.o_orderkey AS first_order, b.o_orderkey AS second_order
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderdate = b.o_orderdate
 AND a.o_orderkey < b.o_orderkey
""",
    tags=("join", "self"),
)
def q_self_join_same_day_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self equi-join with inequality tie-break: same customer+day pairs."""
    o = load_table(spark, sf_dir, "orders")
    a = o.alias("a")
    b = o.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderdate") == F.col("b.o_orderdate"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).select(
        F.col("a.o_orderkey").alias("first_order"),
        F.col("b.o_orderkey").alias("second_order"),
    )


@query(
    "q_asof_sort_based",
    oracle="""
SELECT e.event_id AS event_id,
       MAX(STRFTIME(o.o_orderdate, '%Y-%m-%d %H:%M:%S')) AS last_orderdate
FROM events e
JOIN orders o
  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
WHERE e.event_type = 'purchase'
GROUP BY e.event_id
""",
    tags=("join", "asof", "window", "sortbased"),
)
def q_asof_sort_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SORT-BASED as-of strategy: union both inputs into one timeline
    per key, carry the latest order date forward with a last-non-null
    window, keep the event rows. Same oracle as the join+argmax form
    (q_asof_last_order_before_event) — two physical strategies, one
    semantics.

    Scale tradeoff: the join+argmax form multiplies rows by per-key order
    count before aggregating; this form is one sort per key partition
    with NO row multiplication — the right shape when keys have deep
    history (the classic merge-asof). Orders sort before events at equal
    timestamps (kind 0 < 1), matching the <= bound.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    o = load_table(spark, sf_dir, "orders")
    orders_rows = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.col("o_orderdate").alias("odate"),
        F.lit(None).cast("long").alias("event_id"),
    )
    event_rows = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("odate"),
        "event_id",
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc("t"), F.asc("kind"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    timeline = orders_rows.unionAll(event_rows).withColumn(
        "last_odate", F.last("odate", ignorenulls=True).over(w)
    )
    return (
        timeline.where((F.col("kind") == 1) & F.col("last_odate").isNotNull())
        .groupBy("event_id")  # duplicate event ids exist in the source
        .agg(
            F.max(F.date_format("last_odate", "yyyy-MM-dd HH:mm:ss")).alias(
                "last_orderdate"
            )
        )
    )


@query(
    "q_lateral_top2_orders_per_customer",
    oracle="""
SELECT c.c_custkey AS c_custkey, t.o_orderkey AS o_orderkey,
       CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
FROM customer c,
     LATERAL (
         SELECT o_orderkey, o_totalprice
         FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 2
     ) t
WHERE c.c_custkey < 100
""",
    tags=("join", "lateral", "topk"),
)
def q_lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join: each customer pairs with its own
    top-2 orders by price — the per-row-subquery operator surface (distinct
    from the window-function formulation in
    q_window_topk_orders_per_customer, which the optimizer rewrite of this
    plan converges to).

    Catalyst decorrelates the lateral into a ranked join, so the executed
    plan shuffles once on the correlation key — the same scale shape as
    the window top-k, with the LATERAL syntax a 100 TB user migrating SQL
    workloads expects to keep."""
    from als_pyspark_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey AS c_custkey, t.o_orderkey AS o_orderkey,
               CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
        FROM customer c,
             LATERAL (
                 SELECT o_orderkey, o_totalprice
                 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC
                 LIMIT 2
             ) t
        WHERE c.c_custkey < 100
        """
    )


@query(
    "q_null_safe_join",
    oracle="""
WITH o AS (
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_key
    FROM orders
), dim AS (
    SELECT DISTINCT NULLIF(o_orderstatus, 'O') AS status_key FROM orders
)
SELECT dim.status_key, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM dim JOIN o ON dim.status_key IS NOT DISTINCT FROM o.status_key
GROUP BY dim.status_key
""",
    tags=("join", "null-safe"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing, so the NULL bucket survives as a
    first-class group — the semantics audits need when a dimension key is
    legitimately absent. Catalyst plans <=> as a hash join on the
    null-wrapped key (still an equi-join, still broadcastable), not a
    theta join."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_key")
    )
    dim = o.select("status_key").distinct()
    return (
        dim.alias("d")
        .join(o.alias("o"), F.col("d.status_key").eqNullSafe(F.col("o.status_key")))
        .groupBy(F.col("d.status_key").alias("status_key"))
        .agg(F.count("o.o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# MERGE / upsert: apply a keyed change batch (updates + inserts + deletes)
# to a snapshot, producing the next snapshot — the operation Delta/Iceberg
# MERGE INTO performs, expressed as its relational core. The change batch
# is derived deterministically from the snapshot itself so the oracle can
# rebuild it exactly.

_UPSERT_UPDATE_MOD = 10   # o_orderkey % 10 == 0 → price restated (+10%)
_UPSERT_DELETE_MOD = 10   # o_orderkey % 10 == 1 → order cancelled
_UPSERT_INSERT_OFFSET = 1_000_000_000  # new orders: shifted key space


@query(
    "q_upsert_snapshot",
    oracle=f"""
WITH updates AS (
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 110) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderkey % {_UPSERT_UPDATE_MOD} = 0
), deletes AS (
    SELECT o_orderkey FROM orders WHERE o_orderkey % {_UPSERT_DELETE_MOD} = 1
), inserts AS (
    SELECT o_orderkey + {_UPSERT_INSERT_OFFSET} AS o_orderkey,
           'I' AS o_orderstatus,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderkey % {_UPSERT_DELETE_MOD} = 2
), next_snapshot AS (
    SELECT o.o_orderkey,
           o.o_orderstatus,
           COALESCE(u.price_cents, CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
               AS price_cents
    FROM orders o
    LEFT JOIN updates u ON u.o_orderkey = o.o_orderkey
    WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, price_cents FROM inserts
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM next_snapshot
GROUP BY o_orderstatus
""",
    tags=("merge", "upsert", "join"),
)
def q_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as a composition: apply a change batch — price
    restatements (matched → UPDATE), cancellations (matched → DELETE),
    and late-arriving new orders (not matched → INSERT) — to the orders
    snapshot and aggregate the NEXT snapshot. Exactly what a Delta or
    Iceberg MERGE plans: an equi-join of snapshot × changes on the key,
    per-row action resolution, and a rewrite of affected rows; here the
    whole next snapshot is produced relationally (left join for updates,
    anti join for deletes, union for inserts) and summarized.

    Money travels as integer cents (the restatement is exactly +10% of a
    2-decimal price, lossless in cents), so the aggregate hash-matches
    the oracle exactly.

    100 TB shape: the join is keyed on the snapshot's primary key —
    co-partitioned with the table's layout when bucketed, and the change
    batch side (typically ≪ snapshot) broadcasts; a table-format MERGE
    additionally prunes to the files whose key ranges intersect the
    batch, which is the q_sink_sorted_layout point applied to writes.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    updates = o.where(F.col("o_orderkey") % _UPSERT_UPDATE_MOD == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 110).cast("long").alias("u_cents"),
    )
    deletes = o.where(F.col("o_orderkey") % _UPSERT_DELETE_MOD == 1).select("o_orderkey")
    inserts = o.where(F.col("o_orderkey") % _UPSERT_DELETE_MOD == 2).select(
        (F.col("o_orderkey") + _UPSERT_INSERT_OFFSET).alias("o_orderkey"),
        F.lit("I").alias("o_orderstatus"),
        cents.alias("price_cents"),
    )
    next_snapshot = (
        o.select("o_orderkey", "o_orderstatus", cents.alias("price_cents"))
        .join(F.broadcast(deletes), "o_orderkey", "left_anti")
        .join(F.broadcast(updates), "o_orderkey", "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.coalesce("u_cents", "price_cents").alias("price_cents"),
        )
        .unionByName(inserts)
    )
    return next_snapshot.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("price_cents").alias("total_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "q_snapshot_diff",
    oracle=f"""
WITH v1 AS (
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
), v2 AS (
    SELECT o.o_orderkey,
           CASE WHEN o.o_orderkey % {_UPSERT_UPDATE_MOD} = 0
                THEN CAST(ROUND(o.o_totalprice * 110) AS BIGINT)
                ELSE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) END AS price_cents
    FROM orders o
    WHERE o.o_orderkey % {_UPSERT_DELETE_MOD} <> 1
    UNION ALL
    SELECT o_orderkey + {_UPSERT_INSERT_OFFSET},
           CAST(ROUND(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % {_UPSERT_DELETE_MOD} = 2
), feed AS (
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           b.price_cents AS new_cents
    FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.price_cents <> b.price_cents
)
SELECT op,
       COUNT(*) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(SUM(COALESCE(new_cents, 0)) AS BIGINT) AS new_cents_sum
FROM feed
GROUP BY op
""",
    tags=("merge", "cdc", "diff", "join"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed generation — the INVERSE of q_upsert_snapshot:
    given two table versions, recover the change batch (insert / update /
    delete per key) via a full outer join on the primary key, keeping only
    rows that differ. This is what Delta's change data feed and any
    snapshot-based CDC exporter computes; together with q_upsert_snapshot
    the pair round-trips (diff(v1, apply(v1, B)) ≡ B — pinned in
    tests/test_properties.py). v2 is derived from v1 with the
    same restatement/cancellation/insertion rules as the upsert query, so
    the oracle rebuilds both versions exactly; integer cents keep the
    change-sums lossless.

    100 TB shape: a full outer join co-keyed on the snapshot's primary
    key — one shuffle each side (zero for bucketed snapshots), and a
    table format prunes to files whose stats admit differences. The
    anti-pattern this replaces is exporting full snapshots downstream."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v1 = o.select("o_orderkey", cents.alias("price_cents"))
    v2 = (
        o.where(F.col("o_orderkey") % _UPSERT_DELETE_MOD != 1)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % _UPSERT_UPDATE_MOD == 0,
                F.round(F.col("o_totalprice") * 110).cast("long"),
            )
            .otherwise(cents)
            .alias("price_cents"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % _UPSERT_DELETE_MOD == 2).select(
                (F.col("o_orderkey") + _UPSERT_INSERT_OFFSET).alias("o_orderkey"),
                cents.alias("price_cents"),
            )
        )
    )
    a = v1.alias("a")
    b = v2.alias("b")
    feed = (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .where(
            F.col("a.o_orderkey").isNull()
            | F.col("b.o_orderkey").isNull()
            | (F.col("a.price_cents") != F.col("b.price_cents"))
        )
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            F.when(F.col("a.o_orderkey").isNull(), F.lit("insert"))
            .when(F.col("b.o_orderkey").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
            F.col("b.price_cents").alias("new_cents"),
        )
    )
    return feed.groupBy("op").agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.sum(F.coalesce("new_cents", F.lit(0))).alias("new_cents_sum"),
    )
