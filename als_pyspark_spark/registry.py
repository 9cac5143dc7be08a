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
    # Importable module names this query needs beyond the baked-in stack
    # (e.g. ("google.protobuf",) for transformWithState). Registration is
    # UNCONDITIONAL — the registry's contents are identical on every
    # machine — but sweep views (``__spark_entry__``) and the window
    # invariants exclude queries whose requirements are absent, so a
    # missing optional dependency shows up as a deterministic skip, never
    # as an environment-dependent registry or a guaranteed-red driver row.
    requires: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    requires: tuple[str, ...] = (),
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(
            name=name,
            build=fn,
            oracle=oracle,
            tags=tags,
            doc=fn.__doc__ or "",
            requires=requires,
        )
        return fn

    return deco


def requirements_met(q: Query) -> bool:
    """True when every optional dependency of ``q`` imports cleanly."""
    import importlib

    for mod in q.requires:
        try:
            importlib.import_module(mod)
        except ImportError:
            return False
    return True


# Registration (= driver verification) order. External correctness sweeps
# walk the registry in insertion order and may only cover a prefix, so
# modules with the least accumulated driver evidence register first; the
# per-round verification agenda itself lives in _HOISTED below, which
# overrides module order query-by-query.
_MODULE_ORDER = (
    "als_pyspark_spark.functions.curation_queries",
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
# Round 4: after round 3's rotation, every registered query holds at least
# one driver row across r1∪r2∪r3 (144/144). The remaining agenda is
# FRESHNESS + NEW WORK:
#   1. the three queries whose code changed AFTER their last driver row
#      (the late-round-3 md5 exact-oracle upgrade / driver-side IVF
#      quantizer rework — the acknowledged ROUND-4 HOIST DEBT):
#      q_dedup_simhash, q_ann_lsh_top10, q_ann_ivf_top10;
#   2. every query ADDED in round 4 (never driver-verified — the window
#      invariant in test_registry.py enforces their membership);
#   3. previously-green canaries so each displaced family keeps a live
#      row (streaming / sinks / pandas_udfs / text keep presence via
#      hoisted members; dedup and similarity via the debt entries above).
_HOISTED = (
    # hoist debt — changed after their last driver row, verify first
    "q_dedup_simhash",
    "q_ann_lsh_top10",
    "q_ann_ivf_top10",
    # NEW in round 4 — first driver verification (added as they land)
    "q_repetition_metrics",
    "q_boilerplate_ngrams",
    "q_quality_gate",
    "q_curriculum_stages",
    "q_token_length_histogram",
    "q_mixture_rebalance",
    "q_window_rolling_90d_spend",
    "q_window_ntile_by_nation",
    "q_window_first_last_ignore_nulls",
    "q_listagg_priorities_by_status",
    "q_median_quantity_by_flag",
    "q_null_safe_join",
    "q_try_arithmetic",
    "q_regexp_extract_props",
    "q_month_calendar_orders",
    "q_stream_session_windows",
    "q_stream_foreachbatch_sink",
    "q_multimodal_audio_windows",
    "q_interval_math_shipping",
    "q_union_by_name",
    "q_maxby_top_order_per_customer",
    "q_hll_sketch_union",
    "q_ngram_novelty",
    "q_corr_covar_exact",
    "q_python_datasource_write",
    "q_rollup_region_hierarchy",
    "q_udtf_polymorphic_split",
    "q_explode_outer_zip",
    "q_bitmap_distinct_users",
    "q_vocab_encode_docs",
    "q_user_event_sequences",
    "q_asof_next_purchase_after_click",
    "q_funnel_steps",
    "q_retention_cohorts",
    "q_revenue_mom_change",
    # changed late in round 4 (applicationId-scoped scratch dirs) —
    # fresh driver rows; q_sink_csv_roundtrip is already below as a canary
    "q_sink_partitioned_parquet",
    "q_sink_json_roundtrip",
    "q_sink_orc_roundtrip",
    "q_sink_xml_roundtrip",
    # family canaries (previously driver-green, unchanged)
    "q_stream_tumbling_hourly",
    "q_sink_csv_roundtrip",
    "q_applyinpandas_top2_by_type",
    "q_text_quality",
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
