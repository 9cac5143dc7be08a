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


# ---------------------------------------------------------------------------
# Stale-evidence fingerprinting (round-5 upgrade of the round-4 snapshot).
#
# A driver row is only evidence for the code that produced it, so each
# query carries a fingerprint over its build function's source, its oracle
# SQL, AND the source of every package-internal helper transitively
# reachable from the build function — module-level globals and local
# `from als_pyspark_spark... import` statements alike. Round 4's
# build-source-only hash missed helper rewrites (the word_ngrams class of
# change that created round-3 hoist debt); this closes that gap
# mechanically: a helper-only edit flips the fingerprint of every query
# that reaches the helper, and test_registry.py then forces those queries
# into the round's verification window.

_PKG_PREFIX = "als_pyspark_spark"


def _code_names(code) -> set[str]:
    import types

    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


def _collect_reachable(obj, seen: set[str], out: dict[str, str]) -> None:
    import importlib
    import inspect
    import re

    # Unwrap decorated callables (e.g. pandas_udf wrappers) to the real
    # function whose source we can read.
    for attr in ("__wrapped__", "func"):
        inner = getattr(obj, attr, None)
        if inspect.isfunction(inner):
            obj = inner
            break
    if not (inspect.isfunction(obj) or inspect.isclass(obj)):
        return
    if not getattr(obj, "__module__", "").startswith(_PKG_PREFIX):
        return
    key = f"{obj.__module__}.{getattr(obj, '__qualname__', obj.__name__)}"
    if key in seen:
        return
    seen.add(key)
    try:
        src = inspect.getsource(obj)
    except (OSError, TypeError):
        return
    out[key] = src

    codes = []
    if inspect.isfunction(obj):
        codes.append(obj.__code__)
        namespaces = [obj.__globals__]
    else:  # class: walk its methods' code, resolve against its module
        namespaces = [importlib.import_module(obj.__module__).__dict__]
        for v in vars(obj).values():
            if isinstance(v, (staticmethod, classmethod)):
                v = v.__func__
            if inspect.isfunction(v):
                codes.append(v.__code__)

    names: set[str] = set()
    for code in codes:
        names |= _code_names(code)

    # Local `from als_pyspark_spark.x import y` / `import als_pyspark_spark.x`
    # inside the body never reach __globals__ — import those modules and add
    # their dicts as lookup namespaces (over-approximation is fine: an extra
    # helper in the fingerprint only makes staleness detection stricter).
    for modname in set(re.findall(rf"(?:from|import)\s+({_PKG_PREFIX}[\w.]*)", src)):
        try:
            namespaces.append(importlib.import_module(modname).__dict__)
        except ImportError:
            pass
    # Package modules referenced by name (`sinks.app_scratch`): their dicts
    # become namespaces too, so attribute names in co_names resolve.
    for name in list(names):
        for ns in list(namespaces):
            v = ns.get(name)
            if inspect.ismodule(v) and v.__name__.startswith(_PKG_PREFIX):
                namespaces.append(v.__dict__)

    for name in names:
        for ns in namespaces:
            v = ns.get(name)
            if v is not None:
                _collect_reachable(v, seen, out)


def reachable_sources(fn) -> dict[str, str]:
    """'module.qualname' -> source for every package-internal function or
    class transitively reachable from ``fn`` (including ``fn`` itself)."""
    out: dict[str, str] = {}
    _collect_reachable(fn, set(), out)
    return out


def fingerprint_from_sources(oracle: str | None, sources: dict[str, str]) -> str:
    """Pure hash step, exposed so tests can prove a single-helper edit
    flips the fingerprint."""
    import hashlib

    parts = [oracle or ""]
    for key in sorted(sources):
        parts.append(key + "\n" + sources[key])
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


def query_fingerprint(q: Query) -> str:
    """Evidence fingerprint: build source + oracle + transitive package
    helpers. Stored per-query in tests/query_source_hashes.json at round
    end; compared by test_registry.py during the round."""
    return fingerprint_from_sources(q.oracle, reachable_sources(q.build))


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
    "als_pyspark_spark.operators.graph",
    "als_pyspark_spark.operators.warehouse",
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
    "als_pyspark_spark.operators.timeseries",
)

# Individual queries hoisted to the very front of the registry, ahead of
# their home module's slot. The external sweep verifies a ~50-entry prefix
# per round, so the hoist list IS the round's driver-verification agenda.
#
# Round 6 is a VERIFICATION round (VERDICT r5 "Next round"): zero new
# operators beyond the one mandated approximate-triangle twin; the window
# drains every never-verified query. It carries, in order:
#   1. the two round-5 RED rows, fixed this round — their ARRAY-typed
#      output columns broke the driver's pandas canonicalizer (the
#      project's first red driver rows); both now serialize the arrays to
#      canonical comma-joined strings on BOTH engine sides, and the
#      failure CLASS is dead: the local gate now canonicalizes through
#      pandas exactly like the driver (canon.py) and lints every output
#      schema scalar-only;
#   2. the 20-query round-5 _CARRYOVER — never driver-verified, each
#      exact-oracled and locally green at sf0.001/0.01/0.1;
#   3. the one new query (q_triangle_count_doulion — the edge-sampled
#      cheap tier VERDICT item 5 asked for) plus the two graph queries
#      whose fingerprints flipped this round (persist→materialize→
#      unpersist discipline + shared-helper refactor);
#   4. queries whose code changed in round 5 but whose refresh slots were
#      displaced past that round's prefix (rows-only witness upgrades,
#      app_scratch GC rewrite, manifest/empty-payload ADVICE fixes) — the
#      newest driver rows for these predate their current code;
#   5. vintage rotation — the oldest (r1/r2) driver rows cycle back
#      through, leading with the displaced text/dedup family canaries.
# Everything the round-6 sweep cannot reach remains r1-r5 green with
# unchanged fingerprints (test_changed_queries_are_hoisted enforces
# exactly that), and the tail below the boundary pre-stages round 7's
# rotation.
#
# The round-5 carryover mechanism is DRAINED this round: every former
# _CARRYOVER entry sits inside the prefix. The tuple stays (empty) so
# the invariants keep compiling — a future overflow must repopulate it
# consciously, with the same three rules test_carryover enforces.
_CARRYOVER: tuple[str, ...] = ()

_HOISTED = (
    # 1. round-5 red rows, fixed (array outputs -> canonical strings)
    "q_inverted_index_tokens",
    "q_embedding_quantize_int8",
    # 2. the round-5 carryover block — never driver-verified, leads as
    # promised (same order as r5's _CARRYOVER)
    "q_stream_left_outer_join",
    "q_zorder_layout_sink",
    "q_stream_update_mode_totals",
    "q_python_stream_datasource_sink",
    "q_equidepth_deciles",
    "q_stream_late_data_drop",
    "q_schema_evolution_read",
    "q_json_corrupt_records",
    "q_stream_checkpoint_recovery",
    "q_stream_join_then_window",
    "q_incremental_join_maintenance",
    "q_bfs_part_distances",
    "q_compact_small_files",
    "q_rolling_7d_distinct_users",
    "q_stream_dynamic_session_gap",
    "q_kfold_assignment",
    "q_feature_hashing",
    "q_stream_full_outer_join",
    "q_k_anonymity_generalize",
    "q_stream_static_left_enrich",
    # 3. new this round (the mandated cheap tier) + graph queries whose
    # fingerprints flipped (collected()-materialization, helper refactor)
    "q_triangle_count_doulion",
    "q_triangle_count_parts",
    "q_pagerank_copurchase",
    # 4. changed in round 5, displaced past that round's prefix — newest
    # driver rows predate the current code
    "q_approx_distinct_users",
    "q_approx_percentile_sketch",
    "q_tablesample_stats",
    "q_hll_sketch_union",
    "q_python_datasource_write",
    "q_multimodal_audio_windows",
    "q_maxby_top_order_per_customer",
    "q_sink_partitioned_parquet",
    "q_sink_csv_roundtrip",
    "q_sink_json_roundtrip",
    "q_sink_orc_roundtrip",
    "q_sink_xml_roundtrip",
    "q_stream_foreachbatch_sink",
    "q_pandas_udf_doc_stats",
    # 5. vintage rotation: displaced family canaries first (text/dedup
    # have no other row inside this window), then the oldest r1 rows and
    # the r2-vintage ML flagship
    "q_text_top_tokens",
    "q_dedup_clusters",
    "q3_top_orders",
    "q10_returned_revenue",
    "q5_nation_volume",
    "q_window_topk_orders_per_customer",
    "q_filter_project",
    "q_broadcast_nation_rollup",
    "q_asof_sort_based",
    "q_percentiles_totalprice",
    "als_mse",
    # --- ~50-entry sweep-prefix boundary ---
    # tail: pre-staged round-7 rotation (next-oldest r1/r2 rows); each is
    # unchanged-fingerprint green from r1/r2.
    #
    # Round-7 window plan (vintage census computed end-of-round-6, from
    # CORRECTNESS_r01-05 + the r6 prefix): after the r6 sweep, exactly
    # ONE query has no driver row (the protobuf-gated tws — exempt), and
    # 65 queries' newest rows still date to r1/r2, by family:
    #   dedup/queries 17 (multimodal + ratings + embedding stats ride
    #   here), scalar_funcs 11, windows 6, aggregates 6, joins 5,
    #   setops 5, subqueries 4, text_queries 4, events 4, pandas_udfs 2,
    #   relational 1.
    # A ~50-entry round-7 window of pure rotation (oldest families first,
    # one canary per displaced family) covers all but ~15 of them; the
    # remainder closes in round 8. Keep new-operator additions at or
    # near zero again OR budget their never-verified slots against this
    # rotation explicitly — the r5 lesson (verification debt compounds
    # silently) is one red row away from repeating.
    "q_string_funcs",
    "q6_forecast_revenue",
    "q4_exists_returned_orders",
    "q17_below_avg_qty_revenue",
    "q_anti_join_silent_customers",
    "q_window_moving_avg",
    "q_window_running_spend",
    "q_math_funcs",
    "q_json_events",
    "q_null_semantics",
    "q_ann_ivf_top10",
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
