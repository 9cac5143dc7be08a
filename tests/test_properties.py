"""Property-based tests (hypothesis) for the numeric/text column kernels —
the invariants hold for ALL inputs, not just the fixture corpus.

Strategy: generate small input batches, run the Spark expression once per
batch (createDataFrame → collect), and check against numpy/pure-Python
ground truth. max_examples is kept small because each example is a Spark
job; the value is the adversarial inputs hypothesis finds (empty arrays,
duplicate tokens, negative values), not volume.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from als_pyspark_spark.functions.arrays import cosine, dot, l2_norm
from als_pyspark_spark.functions.hashing import (
    hamming64,
    md5_hash60,
    minhash_signature,
    simhash64,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


@_settings
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=8))
def test_dot_and_norm_match_numpy(spark, pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(dot("a", "b").alias("d"), l2_norm(F.col("a")).alias("n")).collect()[0]
    assert row.d == pytest.approx(float(np.dot(a, b)), rel=1e-9, abs=1e-6)
    assert row.n == pytest.approx(float(np.linalg.norm(a)), rel=1e-9, abs=1e-9)


@_settings
@given(st.lists(finite, min_size=1, max_size=8))
def test_cosine_self_is_one(spark, vec):
    if not any(v != 0 for v in vec):
        return  # zero vector: cosine undefined
    df = spark.createDataFrame([(vec, vec)], "a array<double>, b array<double>")
    c = df.select(cosine("a", "b").alias("c")).collect()[0].c
    assert c == pytest.approx(1.0, abs=1e-9)


token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=8
)


@_settings
@given(st.lists(token, min_size=1, max_size=12))
def test_simhash_deterministic_and_order_insensitive_hamming(spark, toks):
    # simhash is a bag-of-tokens statistic: permuting tokens must not
    # change it, and hamming(x, x) must be 0.
    df = spark.createDataFrame(
        [(toks, list(reversed(toks)))], "a array<string>, b array<string>"
    )
    row = df.select(
        simhash64(F.col("a")).alias("ha"),
        simhash64(F.col("b")).alias("hb"),
        hamming64(simhash64(F.col("a")), simhash64(F.col("b"))).alias("d"),
    ).collect()[0]
    assert row.ha == row.hb
    assert row.d == 0


@_settings
@given(st.lists(token, min_size=0, max_size=10), st.lists(token, min_size=0, max_size=10))
def test_minhash_equal_sets_equal_signatures(spark, xs, ys):
    # signature depends only on the SET of shingles; supersets share ≥ as
    # many minima as their Jaccard predicts in expectation (only the
    # deterministic set-equality case is asserted exactly).
    df = spark.createDataFrame(
        [(xs + xs, xs), (ys, sorted(ys))],
        "a array<string>, b array<string>",
    )
    rows = df.select(
        minhash_signature(F.array_distinct("a"), 8).alias("sa"),
        minhash_signature(F.array_distinct("b"), 8).alias("sb"),
    ).collect()
    for r in rows:
        assert list(r.sa) == list(r.sb)


@_settings
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_hamming_self_zero_any_long(spark, x):
    df = spark.createDataFrame([(x,)], "x long")
    d = df.select(hamming64(F.col("x"), F.col("x")).alias("d")).collect()[0].d
    assert d == 0


def test_hamming_known_distance(spark):
    # flipping k low bits yields hamming k
    df = spark.createDataFrame([(0, 0b1011)], "a long, b long")
    assert df.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()[0].d == 3


@_settings
@given(st.lists(st.text(alphabet="abcxyz :0", min_size=0, max_size=12), min_size=1, max_size=6))
def test_md5_hash60_matches_python_reference(spark, toks):
    # The cross-engine contract behind every exact minhash/simhash oracle:
    # Spark's conv(substring(md5(t),1,15),16,10) must equal the first 60
    # bits of the canonical md5 digest (what DuckDB's ('0x'||...)::BIGINT
    # parses). Pure-Python md5 is the neutral referee.
    import hashlib

    df = spark.createDataFrame([(t,) for t in toks], "t string")
    for r in df.select("t", md5_hash60(F.col("t")).alias("h")).collect():
        assert r.h == int(hashlib.md5(r.t.encode()).hexdigest()[:15], 16)


_token = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@_settings
@given(st.lists(_token, min_size=0, max_size=12), st.integers(min_value=1, max_value=6))
def test_word_ngrams_matches_naive(spark, toks, n):
    """The zip_with-chain n-gram builder must equal the naive Python
    sliding window for ALL token lists and gram sizes — including tokens
    shorter than n, empty lists, and repeated tokens. This pins the
    round-3 rewrite (the O(n)-per-row form) to the definition."""
    from als_pyspark_spark.functions.text import word_ngrams

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = df.select(word_ngrams(F.col("toks"), n).alias("g")).collect()[0].g
    want = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    assert got == want, (toks, n, got, want)


@_settings
@given(st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=20))
def test_discrete_percentile_bounds_match_naive(spark, lengths):
    """The integer-rank percentile recipe (cumulative distinct-value counts
    vs ceil(n/20) / ceil(19n/20)) must select exactly the values the naive
    sorted-list rank picks, for any multiset of lengths."""
    df = spark.createDataFrame([(int(v),) for v in lengths], "n_chars int")
    cnt = df.groupBy("n_chars").agg(F.count("*").alias("c"))
    vals = cnt.select(F.col("n_chars").alias("v"), F.col("c").alias("vc"))
    cum = (
        cnt.join(F.broadcast(vals), F.col("v") <= F.col("n_chars"))
        .groupBy("n_chars")
        .agg(F.sum("vc").alias("cum"))
    )
    tot = cnt.agg(F.sum("c").alias("tot"))
    row = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(tot + 19) div 20"), F.col("n_chars"))
            ).alias("lo"),
            F.min(
                F.when(F.col("cum") >= F.expr("(19 * tot + 19) div 20"), F.col("n_chars"))
            ).alias("hi"),
        )
        .collect()[0]
    )
    s = sorted(lengths)
    nn = len(s)
    lo_want = s[max(0, (nn + 19) // 20 - 1)]
    hi_want = s[max(0, (19 * nn + 19) // 20 - 1)]
    assert (row.lo, row.hi) == (lo_want, hi_want), (lengths, row, lo_want, hi_want)


def test_snapshot_diff_roundtrips_upsert_batch(spark, sf_dir):
    """CDC round-trip: diff(v1, apply(v1, B)) must recover exactly the
    change batch B — op counts equal the batch's update/delete/insert
    populations derived from the base table."""
    from pyspark.sql import functions as F

    from als_pyspark_spark.operators.joins import (
        _UPSERT_DELETE_MOD,
        _UPSERT_UPDATE_MOD,
    )
    from als_pyspark_spark.registry import load_all_queries
    from als_pyspark_spark.sources.tables import load_table

    got = {
        r.op: r.n_rows
        for r in load_all_queries()["q_snapshot_diff"].build(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    expect = {
        "update": o.where(F.col("o_orderkey") % _UPSERT_UPDATE_MOD == 0).count(),
        "delete": o.where(F.col("o_orderkey") % _UPSERT_DELETE_MOD == 1).count(),
        "insert": o.where(F.col("o_orderkey") % _UPSERT_DELETE_MOD == 2).count(),
    }
    assert got == expect
