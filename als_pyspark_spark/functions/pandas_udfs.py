"""Vectorized (Arrow) pandas UDF surface — the sanctioned Python escape
hatch (SURVEY.md §2.10: the reference is row-at-a-time Python closures
everywhere; here Python appears ONLY behind Arrow batches, 10-100× the
row-at-a-time throughput).

The demo query is deliberately oracle-checkable: integer-exact per-row
stats (word count, longest token) that DuckDB computes with list
functions — proving the UDF boundary is lossless, not just plausible.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table

# NB: return types are DataType objects, not DDL strings — parsing a DDL
# string at decoration time needs an active SparkContext, which breaks
# importing this module (e.g. pytest collection) before a session exists.


@pandas_udf(LongType())
def word_count_udf(text: pd.Series) -> pd.Series:
    """Vectorized word count over an Arrow batch.

    A built-in equivalent exists (``F.size(F.split(text, ' '))``, fully
    JVM-side) and is what a production pipeline should use; this query is
    registered as the pandas_udf SURFACE PROOF (SURVEY §2.10) — it
    exercises the Arrow scalar-UDF boundary with an integer-exact oracle.
    """
    return text.str.split(" ").map(len).astype("int64")


@pandas_udf(LongType())
def longest_token_udf(text: pd.Series) -> pd.Series:
    """Length of the longest whitespace token per row.

    Built-in equivalent: ``F.array_max(F.transform(F.split(text, ' '),
    F.length))`` — see word_count_udf for why the pandas_udf form is the
    one registered here (UDF-surface proof, not the recommended hot path).
    """
    return text.str.split(" ").map(lambda ts: max(len(t) for t in ts)).astype("int64")


@query(
    "q_pandas_udf_doc_stats",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
       MAX(list_max(list_transform(string_split(text, ' '), t -> len(t)))) AS max_token_len
FROM documents
GROUP BY source
""",
    tags=("udf", "pandas", "text"),
)
def q_pandas_udf_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc stats computed through Arrow-vectorized pandas UDFs,
    aggregated JVM-side. Integer-exact, so the DuckDB oracle must match —
    the UDF boundary is verified, not assumed."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        word_count_udf("text").alias("n_words"),
        longest_token_udf("text").alias("max_tok"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.max("max_tok").alias("max_token_len"),
    )


@query(
    "q_applyinpandas_top2_by_type",
    oracle="""
SELECT event_type, event_id, rk FROM (
    SELECT event_type, event_id,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rk
    FROM events
) WHERE rk <= 2
""",
    tags=("udf", "pandas", "groupedmap"),
)
def q_applyinpandas_top2_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per event_type, rank by value in pandas
    and keep the top 2 — deliberately replicating a window top-k so the
    DuckDB oracle verifies the grouped-map boundary exactly.

    This is the template for per-group logic Spark genuinely lacks
    (per-group model fits, domain resampling): one Arrow batch per group,
    output schema declared up front. For plain top-k, prefer the window
    operator (operators/windows.py) — this exists to keep the
    applyInPandas path exercised and verified.
    """
    e = load_table(spark, sf_dir, "events")

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(["value", "event_id"], ascending=[False, True]).head(2)
        out = out.reset_index(drop=True)
        out["rk"] = out.index + 1
        return out[["event_type", "event_id", "rk"]]

    return e.select("event_type", "event_id", "value").groupBy("event_type").applyInPandas(
        top2, "event_type string, event_id long, rk long"
    )


@query(
    "q_variant_json_extract",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    tags=("scalar", "variant", "json"),
)
def q_variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path: parse_json into a VARIANT column,
    typed extraction with try_variant_get — the engine-native form of
    schema-on-read JSON (vs string-based get_json_object in
    q_sink_json_roundtrip)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_sum"), F.count("*").alias("n"))
    )


@query(
    "q_udtf_char_ngrams",
    oracle="""
WITH t AS (
    SELECT doc_id, LOWER(SUBSTRING(text, 1, 12)) AS head
    FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       CAST(i - 1 AS BIGINT) AS pos,
       SUBSTRING(head, i, 3) AS gram
FROM t, LATERAL (SELECT UNNEST(generate_series(1, GREATEST(len(head) - 2, 0))) AS i)
""",
    tags=("udf", "udtf", "text"),
)
def q_udtf_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → N character-trigram
    rows. UDTFs are the lateral-join escape hatch when the expansion
    logic is genuinely procedural; the oracle recomputes the same grams
    relationally, verifying the UDTF boundary exactly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos bigint, gram string")
    class CharNgrams:
        def eval(self, doc_id: int, head: str):
            for i in range(max(len(head) - 2, 0)):
                yield doc_id, i, head[i : i + 3]

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    heads = d.select("doc_id", F.lower(F.substring("text", 1, 12)).alias("head"))
    heads.createOrReplaceTempView("udtf_heads")
    spark.udtf.register("char_ngrams", CharNgrams)
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.gram FROM udtf_heads, "
        "LATERAL char_ngrams(doc_id, head) t"
    )


@query(
    "q_udtf_polymorphic_split",
    oracle="""
SELECT doc_id,
       string_split(text, ' ')[1] AS col0,
       string_split(text, ' ')[2] AS col1,
       string_split(text, ' ')[3] AS col2,
       string_split(text, ' ')[4] AS col3
FROM documents WHERE doc_id < 100
""",
    tags=("udf", "udtf", "polymorphic"),
)
def q_udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF: the output schema is computed at analysis
    time by a static analyze() from a constant argument (here: how many
    leading tokens to split into columns) — the Spark 4 API for table
    functions whose shape depends on their call site (dynamic pivots,
    configurable feature expanders). The oracle rebuilds the same columns
    relationally for n=4."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitFirstN:
        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            assert n.isConstantExpression, "n must be a literal"
            schema = StructType().add("doc_id", LongType())
            for i in range(n.value):
                schema = schema.add(f"col{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id: int, text: str, n: int):
            toks = text.split(" ")
            yield (doc_id, *[toks[i] if i < len(toks) else None for i in range(n)])

    PolyUdtf = udtf(SplitFirstN)
    spark.udtf.register("split_first_n", PolyUdtf)
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    d.select("doc_id", "text").createOrReplaceTempView("udtf_poly_docs")
    return spark.sql(
        "SELECT t.* FROM udtf_poly_docs, "
        "LATERAL split_first_n(doc_id, text, 4) t"
    )


@pandas_udf(LongType())
def trimmed_sum_udf(cents: pd.Series) -> int:
    """GROUPED_AGG pandas UDF: sum minus one min and one max instance —
    the robust-statistics trim, integer-exact (pandas int64 arithmetic,
    no floats). Receives the whole group as one Arrow batch and returns
    a scalar — the custom-UDAF surface (reference §2.10 has no UDAF
    concept at all; its aggregations are hand-rolled merge closures,
    e.g. NormalEquation.merge, Solver.py:50-59)."""
    return int(cents.sum() - cents.min() - cents.max())


@pandas_udf(LongType())
def group_count_udf(cents: pd.Series) -> int:
    """GROUPED_AGG count companion — Spark disallows mixing a group
    aggregate pandas UDF with non-pandas aggregates in one agg()
    (INVALID_PANDAS_UDF_PLACEMENT), so the row count rides the same
    Arrow batch."""
    return int(len(cents))


@query(
    "q_pandas_grouped_agg_trimmed",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) - MIN(cents) - MAX(cents) AS BIGINT) AS trimmed_cents
FROM (SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
GROUP BY o_orderpriority
""",
    tags=("udf", "pandas", "grouped-agg"),
)
def q_pandas_grouped_agg_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via a GROUPED_AGG pandas UDF: per priority group, the
    extreme-trimmed sum of order cents — completing the §2.10 UDF
    surface (scalar pandas_udf, grouped-map applyInPandas, mapInPandas,
    UDTF, VARIANT, and now grouped-agg). The trim is ``Σ − min − max``,
    so the oracle replays it with plain SQL aggregates and the Arrow
    aggregation boundary is proven lossless on integers.

    100 TB shape: GROUPED_AGG ships each group to Python as one Arrow
    batch — fine for bounded groups like this 5-priority rollup, and
    exactly the shape to AVOID on high-cardinality fact keys, where the
    built-in equivalent (as in the oracle) keeps partial aggregation
    JVM-side; the docstring IS the decision rule, same as the labeled
    scalar-UDF demo above.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return o.groupBy("o_orderpriority").agg(
        group_count_udf("cents").alias("n_orders"),
        trimmed_sum_udf("cents").alias("trimmed_cents"),
    )


_COGROUP_BUCKETS = 64


def _asof_merge_cogroup(events: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
    """Per-BUCKET cogrouped merge_asof: for each purchase event, the most
    recent order date of the same user within the lookback
    (``merge_asof(by='user_id')`` keeps the per-user asof semantics inside
    each bucket). Inner semantics — events with no qualifying order emit
    nothing (matching the oracle's plain JOIN)."""
    if events.empty or orders.empty:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                             "last_orderdate": pd.Series(dtype="object")})
    left = events.sort_values("ts")
    right = orders.sort_values("o_orderdate")
    merged = pd.merge_asof(
        left,
        right[["user_id", "o_orderdate"]],
        left_on="ts",
        right_on="o_orderdate",
        by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(days=10957),
    )
    merged = merged.dropna(subset=["o_orderdate"])
    return pd.DataFrame(
        {
            "event_id": merged["event_id"].astype("int64"),
            "last_orderdate": merged["o_orderdate"].dt.strftime(
                "%Y-%m-%d %H:%M:%S"
            ),
        }
    )


@query(
    "q_cogroup_asof_merge",
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
    tags=("udf", "cogroup", "applyInPandas", "asof"),
)
def q_cogroup_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join via COGROUPED applyInPandas — the fifth and last pandas/
    Arrow UDF surface (§2.10): ``groupBy(k).cogroup(groupBy(k))`` aligns
    both relations' groups per key and hands each pair of pandas frames to
    ``pd.merge_asof`` (the canonical cogroup use case, per the PySpark
    docs' own example). Semantics identical to the relational composition
    in q_asof_last_order_before_event (same oracle) — registered as the
    cogroup SURFACE PROOF with an exact oracle, while the range-join form
    stays the recommended JVM-side hot path.

    The cogroup key is a BUCKET (user_id mod 64), not the raw user id —
    the load-bearing scale decision: grouped/cogrouped applyInPandas pays
    a per-GROUP Python round-trip (one Arrow batch flush per group;
    measured ~20 ms each, 31.4s for 1,500 per-user groups at sf0.1), so
    Python invocations must scale with a FREE bucket parameter, not key
    cardinality — ``merge_asof(by='user_id')`` keeps exact per-user
    semantics inside each bucket. Measured 31.4→1.2s (warm) at sf0.1; at
    100 TB the bucket count scales with the cluster while per-user
    correctness is untouched. Both sides co-shuffle once on the bucket;
    skew is bounded by the hottest bucket (a tunable), and merge_asof's
    inclusive tolerance matches the oracle's ``>= ts - INTERVAL``
    (fixture event clocks are microsecond-offset and never land on the
    boundary — house boundary discipline).
    """
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.pmod("user_id", F.lit(_COGROUP_BUCKETS)).alias("bucket"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        F.pmod("o_custkey", F.lit(_COGROUP_BUCKETS)).alias("bucket"),
    )
    return (
        e.groupBy("bucket")
        .cogroup(o.groupBy("bucket"))
        .applyInPandas(
            _asof_merge_cogroup, "event_id long, last_orderdate string"
        )
    )


def _arrow_token_stats(batches):
    """mapInArrow body: per-batch token/char stats computed with pyarrow
    compute kernels — zero pandas materialization, the lowest-overhead
    Python batch surface Spark exposes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.add(pc.count_substring(text, " "), 1).cast(pa.int64()),
                pc.utf8_length(text).cast(pa.int64()),
            ],
            names=["doc_id", "n_tokens", "n_chars"],
        )


@query(
    "q_arrow_map_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
    tags=("udf", "mapInArrow", "arrow"),
)
def q_arrow_map_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char counts via mapInArrow — the raw Arrow
    RecordBatch surface (one step below mapInPandas: no pandas conversion
    at all, pyarrow compute kernels on the columnar buffers). Registered
    as the Arrow-batch SURFACE PROOF with an exact integer oracle; the
    JVM built-in (``F.size(F.split(...))``) remains the hot-path form.

    The token count is ``count_substring(' ') + 1``, exactly Spark's
    ``size(split(text, ' '))`` on this corpus (single-space separated,
    split keeps empty trailing strings; both count m separators as m+1
    fields, including the empty-text case: 0 separators → 1 field).

    Scale shape: pure per-batch map over the scan, ZERO shuffles; Arrow
    batch size bounds memory; nothing crosses to Python per row.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _arrow_token_stats, "doc_id long, n_tokens long, n_chars long"
    )
