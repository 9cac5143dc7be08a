"""Scalar function surface: string / date / math / JSON (reference N8-N12
are the only scalar ops it has, SURVEY.md §2.7; everything here is the
built-in pyspark.sql.functions JVM path — no Python UDFs in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table


@query(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name_prefix,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       REPLACE(p_type, ' ', '_') AS type_snake,
       CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green
FROM part
WHERE p_partkey < 500
""",
    tags=("scalar", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (reference only has split, N12 ALS.py:591)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.when(F.col("p_name").contains("green"), 1).otherwise(0).cast("long").alias("has_green"),
    )


@query(
    "q_date_funcs",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS month_revenue
FROM orders
GROUP BY 1, 2
""",
    tags=("scalar", "date", "agg"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction + monthly aggregation."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("month_revenue"),
        )
    )


@query(
    "q_date_trunc_week",
    oracle="""
SELECT STRFTIME(DATE_TRUNC('week', ts), '%Y-%m-%d') AS week_start,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
""",
    tags=("scalar", "date", "agg"),
)
def q_date_trunc_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc to week + count (batch twin of the streaming tumbling
    window in streaming/events.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week_start")
        )
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "q_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(SQRT(l_extendedprice) AS DOUBLE) AS price_sqrt,
       CAST(l_extendedprice * l_extendedprice AS DOUBLE) AS price_sq,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_bucket,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod
FROM lineitem
WHERE l_orderkey < 200
""",
    tags=("scalar", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions on doubles; sqrt is IEEE-exact so hashes match."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_bucket"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )


@query(
    "q_json_events",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    tags=("scalar", "json", "agg"),
)
def q_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column.

    Spark side uses the real JSON path (get_json_object); the DuckDB oracle
    uses a regex on the same fixed-shape payload — equivalent here, and it
    keeps the oracle independent of DuckDB's JSON extension.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


@query(
    "q_array_funcs",
    oracle="""
SELECT label,
       COUNT(*) AS n,
       MIN(vec_id) AS min_id,
       array_to_string((list_sort(list(vec_id)))[1:3], ',') AS first3
FROM embeddings
GROUP BY label
""",
    tags=("scalar", "array", "agg"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + manipulation as first-class values: per label,
    the sorted first-3 vec_ids (collect_list → array_sort → slice).
    ArrayType columns are a capability the reference lacks outright
    (SURVEY.md §1.4 'types the reference does not have')."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.min("vec_id").alias("min_id"),
        # array ops stay exercised (collect_list → array_sort → slice), but the
        # OUTPUT is scalarized: the driver's pandas canonicalizer can't hash lists.
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.collect_list("vec_id")), 1, 3),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("first3"),
    )


@query(
    "q_struct_funcs",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       MAX(o_totalprice) AS max_price,
       MIN(o_orderkey) FILTER (WHERE o_totalprice > 100000) AS first_big_key
FROM orders
GROUP BY o_orderstatus
""",
    tags=("scalar", "struct", "nested"),
)
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested STRUCT columns as first-class values: pack order fields into
    a struct, operate on dotted fields, unpack for output. StructType is
    another capability the reference lacks (SURVEY.md §1.4); max_by on a
    struct demonstrates ordered aggregation over nested comparators."""
    o = load_table(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderstatus",
        F.struct(
            F.col("o_totalprice").alias("price"), F.col("o_orderkey").alias("key")
        ).alias("rec"),
    )
    return nested.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.max(F.col("rec.price")).alias("max_price"),
        F.min(F.when(F.col("rec.price") > 100000, F.col("rec.key"))).alias("first_big_key"),
    )


@query(
    "q_posexplode_tokens",
    oracle="""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents WHERE doc_id < 20
)
SELECT doc_id,
       CAST(i - 1 AS BIGINT) AS pos,
       toks[i] AS tok
FROM t, LATERAL (SELECT UNNEST(generate_series(1, len(toks))) AS i)
""",
    tags=("scalar", "explode", "lateral"),
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode = lateral UNNEST WITH ORDINALITY: token positions as
    first-class rows (0-based here, 1-based ordinality shifted in the
    oracle)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


@query(
    "q_null_semantics",
    oracle="""
SELECT c.c_custkey,
       o.o_orderkey IS NULL AS never_ordered,
       COALESCE(o.o_totalprice, 0.0) AS price_or_zero,
       c.c_custkey IS NOT DISTINCT FROM o.o_custkey AS nullsafe_eq
FROM customer c
LEFT JOIN (SELECT o_custkey, MIN(o_orderkey) AS o_orderkey,
                  CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS o_totalprice
           FROM orders GROUP BY o_custkey) o
  ON o.o_custkey = c.c_custkey
WHERE c.c_custkey < 300
""",
    tags=("scalar", "null", "outer"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL discipline through an outer join: IS NULL flags, COALESCE
    defaults, and null-safe equality (<=> / IS NOT DISTINCT FROM) — the
    three-valued-logic corners every engine must agree on."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderkey").alias("o_orderkey"),
            F.min(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("o_totalprice"),
        )
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.col("o_orderkey").isNull().alias("never_ordered"),
        F.coalesce("o_totalprice", F.lit(0.0)).alias("price_or_zero"),
        F.col("c_custkey").eqNullSafe(F.col("o_custkey")).alias("nullsafe_eq"),
    )


@query(
    "q_map_funcs",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS from_map_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS from_map_o,
       CAST(len(list_distinct(list(o_orderstatus))) AS INT) AS map_size
FROM orders
GROUP BY o_orderpriority
""",
    tags=("scalar", "map", "nested"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType as a first-class value: build a status→count map per
    priority (map_from_entries over grouped counts), then extract typed
    values with element_at and measure with map_keys. Output is scalars
    (map extraction), so the oracle stays engine-portable."""
    o = load_table(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    mapped = per_status.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "n"))
        ).alias("status_counts")
    )
    return mapped.select(
        "o_orderpriority",
        F.coalesce(F.element_at("status_counts", "F"), F.lit(0)).alias("from_map_f"),
        F.coalesce(F.element_at("status_counts", "O"), F.lit(0)).alias("from_map_o"),
        F.size(F.map_keys(F.col("status_counts"))).alias("map_size"),
    )


@query(
    "q_bit_aggs",
    oracle="""
SELECT l_returnflag,
       BIT_AND(l_linenumber) AS all_and,
       BIT_OR(l_linenumber) AS any_or,
       BIT_XOR(l_orderkey) AS key_xor
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "bitwise"),
)
def q_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR) — order-insensitive by algebra, so
    they hash-match without any determinism scaffolding; XOR over keys is
    the classic cheap set-difference fingerprint."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("all_and"),
        F.bit_or("l_linenumber").alias("any_or"),
        F.bit_xor("l_orderkey").alias("key_xor"),
    )


@query(
    "q_try_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice / l_quantity AS unit_price,
       l_extendedprice / NULLIF(l_quantity - l_quantity, 0) AS div_by_zero,
       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int
FROM lineitem
WHERE l_orderkey < 100
""",
    tags=("scalar", "try", "null-semantics"),
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_-family error-safe expressions: try_divide yields NULL on
    division by zero (never an exception, regardless of ANSI mode) and
    try_cast yields NULL on malformed input — the ingestion-hardening
    primitives a pipeline uses instead of letting one bad row kill a
    100 TB job. The oracle mirrors with x / NULLIF(y, 0) and TRY_CAST."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", "l_quantity").alias("unit_price"),
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),
        F.try_to_number("l_returnflag", F.lit("9")).cast("int").alias("flag_as_int"),
    )


@query(
    "q_regexp_extract_props",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(regexp_extract_all(props, '[0-9]+')[1]::BIGINT) AS BIGINT)
           AS sum_k
FROM events
GROUP BY event_type
""",
    tags=("scalar", "regexp"),
)
def q_regexp_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all over the raw props payload: pull every digit run
    from the JSON-ish string, take the first as the metric, aggregate per
    type — the regex-first parse path for semi-structured columns whose
    schema isn't worth declaring (the from_json path is q_json_events).
    Both engines use the same digit-run pattern; element 1 is the value of
    'k' in the single-key payloads."""
    e = load_table(spark, sf_dir, "events")
    k = F.element_at(
        F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), F.lit(0)), 1
    ).cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(k).alias("sum_k")
    )


@query(
    "q_month_calendar_orders",
    oracle="""
WITH months AS (
    SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                  TIMESTAMP '1996-12-01',
                                  INTERVAL 1 MONTH)) AS month_start
)
SELECT strftime(months.month_start, '%Y-%m') AS month,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM months
LEFT JOIN orders o
       ON date_trunc('month', o.o_orderdate) = months.month_start
GROUP BY months.month_start
""",
    tags=("scalar", "sequence", "calendar"),
)
def q_month_calendar_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: generate a month spine with sequence() +
    explode, left-join order counts onto it so empty months surface as 0
    — the gap-filling pattern every time-series report needs (a plain
    GROUP BY silently drops months with no data). The spine is a literal
    sequence (24 rows) and broadcasts onto the fact scan."""
    o = load_table(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit("1995-01-01")),
                F.to_timestamp(F.lit("1996-12-01")),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    )
    return (
        F.broadcast(months)
        .join(
            o,
            F.date_trunc("month", F.col("o_orderdate")) == F.col("month_start"),
            "left",
        )
        .groupBy("month_start")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .select(
            F.date_format("month_start", "yyyy-MM").alias("month"), "n_orders"
        )
    )


@query(
    "q_interval_math_shipping",
    oracle="""
SELECT l.l_orderkey,
       CAST(date_diff('day', o.o_orderdate, MIN(l.l_shipdate)) AS BIGINT)
           AS days_to_first_ship,
       strftime(last_day(o.o_orderdate + INTERVAL 2 MONTH), '%Y-%m-%d')
           AS settlement_due
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY l.l_orderkey, o.o_orderdate
""",
    tags=("scalar", "date", "interval"),
)
def q_interval_math_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic surface: per order, days from order date to
    first shipment (datediff) and a settlement deadline at the end of the
    month two months out (add_months + last_day) — calendar-aware month
    arithmetic, not 60-day approximations. One co-keyed join + grouped
    min; both engines share the proleptic Gregorian calendar."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "l_orderkey",
            F.datediff(F.col("first_ship"), F.col("o_orderdate"))
            .cast("long")
            .alias("days_to_first_ship"),
            F.date_format(
                F.last_day(F.add_months(F.col("o_orderdate"), 2)), "yyyy-MM-dd"
            ).alias("settlement_due"),
        )
    )


@query(
    "q_explode_outer_zip",
    oracle="""
WITH t AS (
    SELECT doc_id,
           string_split(text, ' ') AS toks,
           CASE WHEN len(string_split(text, ' ')) >= 40
                THEN string_split(text, ' ')[1:3] ELSE [] END AS head3
    FROM documents WHERE doc_id < 60
)
SELECT doc_id,
       CAST(pos - 1 AS INT) AS pos,
       CASE WHEN len(head3) >= pos THEN head3[pos] END AS tok,
       CASE WHEN len(head3) >= pos THEN len(head3[pos]) END AS tok_len
FROM t LEFT JOIN LATERAL (
    SELECT UNNEST(generate_series(1, GREATEST(len(head3), 1))) AS pos
) ON TRUE
""",
    tags=("scalar", "explode-outer", "arrays-zip"),
)
def q_explode_outer_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER explode over a sometimes-empty array: docs under the length
    cutoff produce an EMPTY head3 array, and posexplode_outer keeps them as
    one (NULL, NULL) row instead of silently dropping the document — the
    left-join-flavored lateral view a pipeline needs when 'no extracted
    items' must still be visible downstream. The exploded element rides
    with a zipped per-element attribute (arrays_zip of the tokens and
    their lengths — the struct-of-parallel-arrays pattern)."""
    from als_pyspark_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    toks = tokens(F.col("text"))
    head3 = F.when(F.size(toks) >= 40, F.slice(toks, 1, 3)).otherwise(
        F.array().cast("array<string>")
    )
    zipped = F.arrays_zip(
        head3.alias("tok"),
        F.transform(head3, lambda t: F.length(t)).alias("tok_len"),
    )
    return (
        d.select("doc_id", zipped.alias("z"))
        .select("doc_id", F.posexplode_outer("z").alias("pos", "e"))
        .select(
            "doc_id",
            F.coalesce(F.col("pos"), F.lit(0)).cast("int").alias("pos"),
            F.col("e.tok").alias("tok"),
            F.col("e.tok_len").cast("bigint").alias("tok_len"),
        )
    )
