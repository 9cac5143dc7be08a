"""Central query registry.

Every operator/query this engine claims (SURVEY.md §2 inventory + the
extension operators) registers here with:

- ``build(spark, sf_dir) -> DataFrame``  — the Spark-native implementation
- ``oracle``                             — equivalent DuckDB ANSI SQL, or
  ``None`` for genuinely non-SQL-expressible ops (ML training, LSH, streaming)

``__spark_entry__.queries()`` / ``oracle_sql()`` and the pytest correctness
gate are both thin views over this registry, so local tests exercise exactly
the driver's contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(
            name=name, build=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


# Registration (= driver verification) order. External correctness sweeps
# walk the registry in insertion order and may only cover a prefix, so
# modules with the least accumulated driver evidence register first; the
# per-round verification agenda itself lives in _HOISTED below, which
# overrides module order query-by-query.
_MODULE_ORDER = (
    "als_pyspark_spark.dedup.queries",
    "als_pyspark_spark.similarity.queries",
    "als_pyspark_spark.functions.text_queries",
    "als_pyspark_spark.multimodal.queries",
    "als_pyspark_spark.ml.queries",
    "als_pyspark_spark.streaming.queries",
    "als_pyspark_spark.sources.sinks",
    "als_pyspark_spark.functions.pandas_udfs",
    "als_pyspark_spark.operators.events",
    "als_pyspark_spark.functions.pipeline_queries",
    "als_pyspark_spark.sources.python_datasource",
    "als_pyspark_spark.operators.physical",
    "als_pyspark_spark.operators.grouping",
    "als_pyspark_spark.operators.tpch_more",
    "als_pyspark_spark.operators.tpch_rest",
    "als_pyspark_spark.operators.subqueries",
    "als_pyspark_spark.operators.relational",
    "als_pyspark_spark.operators.joins",
    "als_pyspark_spark.operators.windows",
    "als_pyspark_spark.operators.aggregates",
    "als_pyspark_spark.operators.setops",
    "als_pyspark_spark.operators.scalar_funcs",
)

# Individual queries hoisted to the very front of the registry, ahead of
# their home module's slot. The external sweep verifies a ~50-entry prefix
# per round, so the hoist list IS the round's driver-verification agenda.
#
# Round 3: the 35 queries that have never had a driver row in ANY round
# (r1 ∪ r2 union — all 10 pipeline operators, the Python DataSource pair,
# bucketed/salted physical plans, grouping-sets/pivot, session/range/
# timebucket event ops, and the TPC-H tail incl. the 5 round-2 additions),
# plus the 4 queries changed this round, the 13 queries ADDED this round
# (every registry entry must hold driver evidence ∪ window membership —
# test_registry.py enforces it), and two previously-green canaries
# (q_pandas_udf_doc_stats, als_mse). That fills the window exactly, so the
# remaining canary role is carried by the new members of each displaced
# family — an environment-class regression in streaming/sinks/text/dedup/
# similarity breaks those rows just as loudly as a previously-green row
# would.
#
# The md5 hash-family upgrade (xxhash64 → md5, buying EXACT DuckDB oracles
# for the whole hash-dedup family) landed after the original rotation was
# drafted; of the three queries it changed, q_dedup_minhash_lsh — the
# costliest and most load-bearing — takes the als_mse canary slot for a
# fresh exact driver row (the ALS family is covered by six exact-green r2
# rows and its code is unchanged since; als_mse stays measured in bench).
#
# ROUND-4 HOIST DEBT: q_dedup_simhash and q_ann_lsh_top10 also changed in
# that upgrade but no further slot frees without evicting a never-verified
# query. Their r2 rows-only driver rows predate the change — hoist both
# into the round-4 window for fresh exact rows. q_ann_ivf_top10 (rows-only
# by design) likewise changed late in round 3 (driver-side quantizer fit)
# and should rotate in for a fresh row.
_HOISTED = (
    # changed this round — verify first
    "q_shuffle_order",
    "q_vocab_top",
    "q_length_filter_percentile",
    "q_embedding_neardup_pairs",
    # NEW this round — first driver verification
    "q_chunk_documents",
    "q_pack_sequences",
    "q_stream_stateful_threshold",
    "q_bm25_retrieval",
    "q_dedup_ngram_containment",
    "q_semantic_cluster_assign",
    "q_sink_xml_roundtrip",
    "q_unpivot_lineitem_measures",
    "q_lateral_top2_orders_per_customer",
    # canaries: one previously-driver-green query per displaced family
    # (sinks/text/streaming keep window presence via their NEW queries
    # q_sink_xml_roundtrip / q_bm25_retrieval / q_stream_stateful_threshold)
    "q_pandas_udf_doc_stats",
    # changed post-rotation (md5 exact-oracle upgrade) — fresh driver row
    "q_dedup_minhash_lsh",
    # NEW: streaming custom Python DataSource (offset-walk drain)
    "q_python_stream_datasource",
    # NEW: Observation-API metrics + collation-aware grouping
    "q_observe_metrics",
    "q_collated_group",
    # never driver-verified: pipeline operators
    "q_split_train_test",
    "q_sample_stratified",
    "q_sample_balanced",
    "q_decontaminate",
    "q_text_normalize",
    "q_pii_redact",
    "q_doc_salient_terms",
    # never driver-verified: Python DataSource
    "q_python_datasource_scan",
    "q_python_datasource_agg",
    # never driver-verified: physical layout (bucketing / salting)
    "q_bucketed_colocated_join",
    "q_salted_skew_join",
    "q_two_phase_salted_agg",
    # never driver-verified: grouping sets / pivot
    "q_grouping_sets_orders",
    "q_pivot_priority_by_status",
    # never driver-verified: event-time ops
    "q_range_join_purchase_context",
    "q_timebucket_rollup",
    "q_session_windows",
    # never driver-verified: TPC-H tail (incl. the 5 round-2 shapes)
    "q2_min_cost_supplier",
    "q7_nation_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q11_important_part_values",
    "q12_late_shipment_priority",
    "q13_customer_order_distribution",
    "q14_promo_revenue_pct",
    "q15_top_supplier_revenue",
    "q16_supplier_counts_by_part",
    "q18_in_big_orders",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers_of_parts",
    "q21_multi_supplier_orders",
    "q22_wealthy_inactive_customers",
)


def load_all_queries() -> dict[str, Query]:
    """Import every module that registers queries, then return the registry
    in verification-priority order (see ``_MODULE_ORDER``)."""
    import importlib

    # Imports are side-effectful (decorator registration); keep the list
    # explicit so a broken module is an import error, not silent missing
    # coverage.
    for mod in _MODULE_ORDER:
        importlib.import_module(mod)

    ordered = {n: QUERIES[n] for n in _HOISTED if n in QUERIES}
    ordered.update(QUERIES)
    QUERIES.clear()
    QUERIES.update(ordered)
    return QUERIES
