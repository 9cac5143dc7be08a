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
# Round 11 agenda (VERDICT r10 "Next round" items 2-4 + the ADVICE lows):
#   1. fingerprint flips from this round's fixes, all previously green,
#      re-verify: the decontaminate gram-cache deferred release, the IVF /
#      IVF-PQ embedding-batch guards (+ any recall-floor retune), and the
#      two connected-components queries via the session-helper heartbeat
#      gate (transitive fingerprint through ensure_checkpoint_dir);
#   2. the full remaining 35-row r5-vintage block — landing these closes
#      the r5 vintage entirely: no query's newest driver row predates r6.
# Family canaries (streaming/sinks/pandas_udfs/text/dedup/similarity) are
# all inside blocks 1-2 this round (q_stream_* x4, q_sink_sorted_layout,
# q_pandas_grouped_agg_trimmed, q_source_vocab_overlap, q_dedup_clusters +
# q_fuzzy_part_match, and the ANN trio).
#
# The carryover mechanism stays DRAINED (empty since round 6); a future
# overflow must repopulate it consciously, with the same three rules
# test_carryover enforces.
_CARRYOVER: tuple[str, ...] = ()

_HOISTED = (
    # 1. fingerprint flips (deferred gram-cache release; embedding batch
    # guards on both mapInArrow corpus passes; checkpoint-heartbeat
    # session helper reachable from both CC queries)
    "q_decontaminate",
    "q_ann_ivf_top10",
    "q_ann_ivfpq_top10",
    "q_semantic_dedup_clusters",
    "q_dedup_clusters",
    # (added mid-round) the exact-substring tier's two-phase dup count —
    # the salting caveat closed structurally — flips both span queries
    "q_dedup_substring_spans",
    "q_dedup_scrub_spans",
    # NEW round-11 operators — first-window green required: the
    # exact-complete prefix-filtered set-similarity join (PPJoin tier)
    # and distributed PCA (one-pass Gramian moments + driver eig +
    # distributed projection, spectral-identity self-witness)
    "q_dedup_jaccard_prefix_join",
    "q_embedding_pca_project",
    # NEW round-11 extended-session operators — first-window green
    # required: exact weighted reservoir sampling (A-ES via the
    # max-of-w-draws identity) and synchronous label propagation
    "q_sample_weighted_reservoir",
    "q_label_propagation_communities",
    # (extended session) clone-class collapse fingerprint flip — the
    # MinHash tier now groups identical gram sets before banding/verify
    "q_dedup_minhash_lsh",
    # (extended session) consistent-hash sharding with resize-delta witness
    "q_consistent_shard_assignment",
    # (extended session) clone-class collapse fingerprint flip — SimHash
    # computes the vote fold once per distinct text before chunk blocking
    "q_dedup_simhash",
    # (extended session) cross-tier recall audit (winnow/minhash vs the
    # exact-complete prefix join), oracle composed from the tiers' own SQL
    "q_dedup_tier_recall",
    # (extended session) contrastive training-pair mining (near-dup
    # positives + seeded hash negatives addressed via the shuffle index)
    "q_contrastive_pairs",
    # (extended session) k-core peeling — the iterative subgraph-shrinking
    # shape (monotone working set), 3 unrolled rounds, exact oracle
    "q_kcore_peeling",
    # 2. the full remaining r5-vintage block — closes the r5 debt
    "q_constraint_checks",
    "q_corr_covar_exact",
    "q_cumulative_distinct_users",
    "q_event_transition_matrix",
    "q_fuzzy_part_match",
    "q_gapfill_locf_daily",
    "q_incremental_agg_merge",
    "q_latency_percentile_bands",
    "q_leakage_safe_split",
    "q_market_basket_pairs",
    "q_multitouch_attribution",
    "q_ohlc_hourly_bars",
    "q_pandas_grouped_agg_trimmed",
    "q_pareto_abc_parts",
    "q_profile_orders",
    "q_recency_weighted_engagement",
    "q_recursive_referral_depth",
    "q_relational_division",
    "q_revenue_trend_ols",
    "q_scd2_customer_history",
    "q_scd2_point_in_time",
    "q_sink_sorted_layout",
    "q_skew_diagnostics",
    "q_snapshot_diff",
    "q_source_vocab_overlap",
    "q_stream_apws_user_max",
    "q_stream_dedup_count",
    "q_stream_dedup_within_watermark",
    "q_stream_ohlc_hourly",
    "q_table_checksum",
    "q_target_encoding_loo",
    "q_upsert_snapshot",
    "q_weighted_sampling",
    # --- 50-entry sweep-prefix boundary. The extended session added 8
    # mandatory window entries (6 never-verified new ops + the 3
    # clone-class perf rewrites, one overlapping), which displaces the
    # LAST TWO r5-vintage rows below. Both are code-unchanged since r5
    # and formerly green, the lowest-risk deferral class (every other
    # hoisted entry is either never-verified or changed-since-its-last-
    # driver-row — deferring those would create stale evidence instead
    # of aged evidence). They sit immediately past the boundary so they
    # LEAD the round-12 window; carryover does not apply (it is reserved
    # for never-verified queries). Conscious decision, recorded also in
    # SURVEY.md's build log.
    "q_winsorize_prices",
    "q_zscore_outlier_orders",
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
