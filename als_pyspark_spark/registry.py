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
# Round 9 agenda (VERDICT r8 "Next round" items 1, 4, 6):
#   1. round 8's only red rows, FIXED — both CC queries died in
#      Dataset.checkpoint because the checkpoint dir was wired only in
#      build_session and the driver's bare session has none;
#      min_label_components now claims a dir lazily on its own session
#      (session.ensure_checkpoint_dir), and check_correctness.py --bare +
#      a subprocess pytest gate the bare-session class from now on;
#   2. new round-9 operators (intra-doc repeated-span stats, broadcast
#      linear quality scorer) — first-window green required;
#   3. round-9 ADVICE fixes whose fingerprints flip: the idempotent-merge
#      algebraic witness went distributed (exceptAll counts instead of a
#      2× driver collect) and both ANN bucket caches now release through
#      caching.collected instead of leaking for the session lifetime;
#   4. the 27 pre-staged r3-vintage rows — landing these closes the r3
#      vintage debt entirely: no family's newest driver row predates r4;
#   5. the oldest r4-vintage block the remaining slots can carry (11 of
#      37, alphabetical — the dedup sketch family, pandas-UDF/UDTF
#      surface, misc relational) plus the sinks-family canary; the tail
#      pre-stages round 10's rotation with the other 25 r4 rows.
#
# The carryover mechanism stays DRAINED (empty since round 6); a future
# overflow must repopulate it consciously, with the same three rules
# test_carryover enforces.
_CARRYOVER: tuple[str, ...] = ()

_HOISTED = (
    # 1. round 8's red rows — checkpoint-dir fix, must lead the window
    "q_dedup_clusters",
    "q_semantic_dedup_clusters",
    # 2. new round-9 operators (first-window green required); the UDF
    # pair completes all five pandas/Arrow surfaces (§2.10): cogrouped
    # applyInPandas (merge_asof) and mapInArrow (pyarrow kernels)
    "q_dedup_intra_doc_spans",
    "q_dedup_chunk_level",
    "q_quality_linear_scorer",
    "q_cogroup_asof_merge",
    "q_arrow_map_token_stats",
    # 3. ADVICE-fix fingerprint flips (all previously green; re-verify) —
    # q_ann_ivf_top10 joins them late-round: same bounded-result cache
    # release as the LSH/rerank pair (collected + lazy _ivf_plan helper)
    "q_stream_idempotent_merge",
    "q_rerank_two_stage_topk",
    "q_ann_lsh_top10",
    "q_ann_ivf_top10",
    # 4. the full r3-vintage block — closes the r3 debt entirely
    "q_pivot_priority_by_status",
    "q_dedup_ngram_containment",
    "q_embedding_neardup_pairs",
    "q20_heavy_shippers_of_parts",
    "q21_multi_supplier_orders",
    "q_unpivot_lineitem_measures",
    "q_lateral_top2_orders_per_customer",
    "q_observe_metrics",
    "q_bm25_retrieval",
    "q_chunk_documents",
    "q_collated_group",
    "q_decontaminate",
    "q_doc_salient_terms",
    "q_length_filter_percentile",
    "q_pack_sequences",
    "q_pii_redact",
    "q_python_datasource_agg",
    "q_python_datasource_scan",
    "q_python_stream_datasource",
    "q_sample_balanced",
    "q_sample_stratified",
    "q_semantic_cluster_assign",
    "q_split_train_test",
    "q_stream_stateful_threshold",
    "q_text_normalize",
    "q_timebucket_rollup",
    "q_vocab_top",
    # 5. oldest r4 vintage — alphabetical prefix (q_ann_lsh_top10
    # already re-enters above via its fingerprint flip)
    "q_applyinpandas_top2_by_type",
    "q_asof_next_purchase_after_click",
    "q_bitmap_distinct_users",
    "q_boilerplate_ngrams",
    "q_curriculum_stages",
    "q_dedup_exact",
    "q_dedup_exact_survivors",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_explode_outer_zip",
    # 6. sinks-family canary (freshest green r8) — every extension family
    # keeps one previously-green row in-window (test_registry lint); the
    # other families are already covered by the blocks above
    "q_sink_csv_roundtrip",
    # --- ~50-entry sweep-prefix boundary ---
    # tail: pre-staged round-10 rotation — the remaining 21 r4-vintage
    # rows (after round 9 lands these are the suite's oldest driver
    # evidence; all fingerprint-unchanged, their green r4 rows stay
    # valid; five r4 rows displaced from the prefix by the sinks canary,
    # the chunk-level dedup op, the late IVF hoist, and the two late UDF
    # surface proofs)
    "q_funnel_steps",
    "q_interval_math_shipping",
    "q_listagg_priorities_by_status",
    "q_median_quantity_by_flag",
    "q_mixture_rebalance",
    "q_month_calendar_orders",
    "q_ngram_novelty",
    "q_null_safe_join",
    "q_quality_gate",
    "q_regexp_extract_props",
    "q_repetition_metrics",
    "q_retention_cohorts",
    "q_revenue_mom_change",
    "q_rollup_region_hierarchy",
    "q_stream_tumbling_hourly",
    "q_text_quality",
    "q_token_length_histogram",
    "q_try_arithmetic",
    "q_udtf_polymorphic_split",
    "q_union_by_name",
    "q_user_event_sequences",
    "q_vocab_encode_docs",
    "q_window_first_last_ignore_nulls",
    "q_window_ntile_by_nation",
    "q_window_rolling_90d_spend",
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
