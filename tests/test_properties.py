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


def test_scd2_intervals_partition_version_space(spark, sf_dir):
    """SCD2 invariants per key: intervals start at version 1, chain
    contiguously (each valid_to equals the next valid_from), and exactly
    one open (is_current) interval exists."""
    from als_pyspark_spark.registry import load_all_queries

    rows = (
        load_all_queries()["q_scd2_customer_history"]
        .build(spark, sf_dir)
        .collect()
    )
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    assert by_key
    for key, ivals in by_key.items():
        ivals.sort(key=lambda r: r.valid_from)
        assert ivals[0].valid_from == 1, key
        opens = [r for r in ivals if r.valid_to is None]
        assert len(opens) == 1 and ivals[-1].valid_to is None, key
        for a, b in zip(ivals, ivals[1:]):
            assert a.valid_to == b.valid_from, key


def test_table_checksum_matches_python_reference(spark, sf_dir):
    """The XOR fingerprint must equal an independent pure-Python
    recomputation (hashlib.md5 over the same canonical serialization) —
    a third implementation beyond Spark and DuckDB."""
    import hashlib

    from als_pyspark_spark.registry import load_all_queries
    from als_pyspark_spark.sources.tables import load_table

    row = load_all_queries()["q_table_checksum"].build(spark, sf_dir).collect()[0]
    xor = 0
    n = 0
    for r in load_table(spark, sf_dir, "orders").collect():
        canon = "|".join(
            [
                str(r.o_orderkey),
                str(r.o_custkey),
                r.o_orderstatus,
                str(round(r.o_totalprice * 100)),
            ]
        )
        xor ^= int(hashlib.md5(canon.encode()).hexdigest()[:15], 16)
        n += 1
    assert row.n_rows == n
    assert row.checksum_xor == xor


def test_cdc_lww_equals_sequential_apply(spark, sf_dir):
    """Last-writer-wins compaction must be equivalent to applying the
    change feed one sequence number at a time (update@1, update@2,
    delete@3) — the semantic contract of CDC compaction."""
    from als_pyspark_spark.registry import load_all_queries
    from als_pyspark_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    state = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # seq 1 then seq 2: successive full-price restatements on %3==0 keys
    for factor in (105, 110):
        upd = o.where(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * factor).cast("long").alias("u"),
        )
        state = (
            state.join(upd, "o_orderkey", "left")
            .select(
                "o_orderkey",
                "o_orderstatus",
                F.coalesce("u", "cents").alias("cents"),
            )
        )
    # seq 3: deletes on %9==0 keys
    dels = o.where(F.col("o_orderkey") % 9 == 0).select("o_orderkey")
    state = state.join(dels, "o_orderkey", "left_anti")
    expect = {
        r.o_orderstatus: (r.n, r.c)
        for r in state.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("c"))
        .collect()
    }
    got = {
        r.o_orderstatus: (r.n_orders, r.total_cents)
        for r in load_all_queries()["q_cdc_last_writer_wins"]
        .build(spark, sf_dir)
        .collect()
    }
    assert got == expect


def test_pagerank_rank_bounds(spark, sf_dir):
    """Fixed-point PageRank invariants: every rank is at least the
    damping base (150000 micro-units) and truncating division can only
    lose mass, so no rank exceeds the total initial mass."""
    from als_pyspark_spark.registry import load_all_queries

    rows = (
        load_all_queries()["q_pagerank_copurchase"].build(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert r.rank_micro >= 150000
        assert r.rank_micro < 10**6 * 10**6  # << n * 1e6 for any fixture


@_settings
@given(
    st.lists(
        st.integers(min_value=0, max_value=1023), min_size=2, max_size=12
    )
)
def test_morton_spread_interleave_roundtrip(spark, xs):
    """The Z-order bit spread is a bijection into even bit positions:
    interleaving (x, y) and de-interleaving recovers both coordinates,
    and z-codes preserve equality exactly (pure-Python reference)."""
    from als_pyspark_spark.sources.sinks import _morton_spread

    ys = list(reversed(xs))
    df = spark.createDataFrame(list(zip(xs, ys)), "cx long, dy long")
    got = (
        df.select(
            "cx",
            "dy",
            F.expr(f"{_morton_spread('cx')} | ({_morton_spread('dy')} << 1)").alias("z"),
        )
        .collect()
    )

    def spread(v: int) -> int:
        out = 0
        for i in range(16):
            out |= ((v >> i) & 1) << (2 * i)
        return out

    for row in got:
        assert row.z == spread(row.cx) | (spread(row.dy) << 1)


@_settings
@given(
    st.lists(
        st.integers(min_value=0, max_value=72 * 3600), min_size=1, max_size=40
    )
)
def test_sweep_line_concurrency_matches_brute_force(spark, offsets):
    """q_max_concurrent_sessions' two-phase prefix sum must equal the
    brute-force per-instant maximum over [ts, ts+30m) intervals, for any
    arrangement of starts — including exact ties and day-boundary spans.

    Calls the production helper (sweep_line_daily_max) directly, so the
    test exercises the shipped operator, not a parallel copy. Round 7's
    hypothesis run falsified the pre-fix per-ROW running sum with two
    sessions ending exactly at midnight (phantom partial-prefix state on
    a day whose true peak was 0); this property is the regression guard.
    """
    import datetime as dt

    from als_pyspark_spark.operators.timeseries import sweep_line_daily_max

    base = dt.datetime(2024, 1, 1)
    starts = [base + dt.timedelta(seconds=o) for o in offsets]
    dur = dt.timedelta(minutes=30)

    # brute force: evaluate concurrency at every boundary instant
    def conc_at(t):
        return sum(1 for s in starts if s <= t < s + dur)

    days = {}
    for s in starts:
        for b in (s, s + dur):
            d = b.date()
            days.setdefault(d, 0)
    for d in list(days):
        bounds = [b for s in starts for b in (s, s + dur) if b.date() == d]
        days[d] = max(conc_at(b) for b in bounds) if bounds else 0

    df = spark.createDataFrame([(s,) for s in starts], "t timestamp")
    got = {
        row.day: row.max_concurrent
        for row in sweep_line_daily_max(df).collect()
    }
    for d, expect in days.items():
        assert got.get(d, 0) == expect, (d, got, days, starts)


@_settings
@given(
    st.lists(
        st.tuples(
            # offsets drawn from a SMALL grid so exact timestamp ties are
            # the common case, not a fluke — the tie behavior is the point
            st.integers(min_value=0, max_value=12).map(lambda k: k * 600),
            st.booleans(),  # purchase? (60-min gap) vs other (30-min gap)
        ),
        min_size=1,
        max_size=12,
    )
)
def test_dynamic_gap_sessions_match_brute_force(spark, events):
    """Round-8 window-under-ties audit guard: the dynamic-gap session
    operator (session_window with a per-event gap expression, the
    q_stream_dynamic_session_gap shape) must partition events into the
    same sessions as a first-principles merge — for any input order and
    any arrangement of EXACT timestamp ties, including ties that mix
    60-minute and 30-minute gap events.

    The audited risk: the oracle's gaps-and-islands form tests
    ``ts > MAX(ev_end) OVER (... 1 PRECEDING)`` — a per-ROW frame whose
    content inside a tie group depends on tie permutation. The membership
    argument (every ev_end > ts, so tied events always merge and exactly
    one tie row carries the new-session flag) says the SESSION-level
    output is permutation-invariant; this property pins that argument to
    executable truth against Spark's native merge."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(seconds=o), "purchase" if p else "view")
        for o, p in events
    ]

    def end_of(ts, typ):
        return ts + dt.timedelta(minutes=60 if typ == "purchase" else 30)

    # brute force: sweep in ts order; merge iff ts <= running max end —
    # Spark merges an event arriving EXACTLY at the session's end (probed
    # round 8: static and dynamic gap forms agree), so the new-session
    # test is STRICT (ts > end), mirrored in all three session oracles
    expect = []
    for ts, typ in sorted(rows, key=lambda r: r[0]):
        if expect and ts <= expect[-1][1]:
            s = expect[-1]
            expect[-1] = (s[0], max(s[1], end_of(ts, typ)), s[2] + 1)
        else:
            expect.append((ts, end_of(ts, typ), 1))
    expect_set = {(s, e, n) for s, e, n in expect}

    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    gap = F.when(F.col("event_type") == "purchase", "60 minutes").otherwise(
        "30 minutes"
    )
    got = {
        (row.w.start, row.w.end, row.n)
        for row in df.groupBy(F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expect_set, (rows, got, expect_set)


@_settings
@given(
    st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=10, max_size=60
    )
)
def test_equidepth_bucket_location_matches_sorted_reference(spark, vals):
    """The bucket-count rank-location decomposition must return exactly
    the ⌊k·n/10⌋-th smallest value for every decile, matching a plain
    sorted-list lookup — duplicates, skew, and tiny buckets included."""
    from pyspark.sql import Window

    n = len(vals)
    expect = {k: sorted(vals)[(k * n) // 10 - 1] for k in range(1, 10) if (k * n) // 10 >= 1}

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    bucketed = df.select("v", F.expr("v DIV 100").alias("b"))
    counts = bucketed.groupBy("b").agg(F.count("*").alias("cnt"))
    cum_w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.select(
        "b", "cnt", F.coalesce(F.sum("cnt").over(cum_w), F.lit(0)).alias("below")
    )
    targets = spark.range(1, 10).select(
        F.col("id").alias("k"), ((F.col("id") * n) / 10).cast("long").alias("r")
    )
    hits = (
        cum.join(
            F.broadcast(targets),
            (F.col("below") < F.col("r"))
            & (F.col("below") + F.col("cnt") >= F.col("r")),
        )
        .select("k", F.col("b").alias("hb"), (F.col("r") - F.col("below")).alias("off"))
        .collect()
    )
    in_b = Window.partitionBy("b").orderBy("v")
    ranked = bucketed.where(
        F.col("b").isin([int(h.hb) for h in hits])
    ).select("b", "v", F.row_number().over(in_b).alias("rn")).collect()
    got = {}
    for h in hits:
        for row in ranked:
            if row.b == h.hb and row.rn == h.off:
                got[h.k] = row.v
    assert got == expect, (got, expect, vals)


@_settings
@given(
    st.lists(
        # a 300-second grid over ~2 days keeps exact hour/slide-boundary
        # hits common (every 6th/12th point) — boundary membership is the
        # point — with a +7s sprinkle so misaligned rows ride along
        st.tuples(
            st.integers(min_value=0, max_value=576).map(lambda k: k * 300),
            st.booleans(),
        ).map(lambda t: t[0] + (7 if t[1] else 0)),
        min_size=1,
        max_size=14,
    )
)
def test_tumbling_and_sliding_window_match_bucket_arithmetic(spark, offsets):
    """Round-8 boundary-audit guard for F.window: the tumbling/sliding
    oracles do NOT mirror the Spark expression — they claim an arithmetic
    equivalence (tumbling = date_trunc floor; sliding 1h/30m = each event
    in exactly the two windows {bucket, bucket − slide}). Those claims
    were verified by hand this round; this property pins them to Spark's
    actual [start, end) assignment, with timestamps landing EXACTLY on
    hour and slide boundaries as the common case — the spot the fixture's
    microsecond clocks never touch (the gap that hid both round-8 bugs).
    """
    import datetime as dt
    from collections import Counter

    base = dt.datetime(2024, 1, 1)
    stamps = [base + dt.timedelta(seconds=o) for o in offsets]

    def floor_to(ts, seconds):
        rem = (ts - base).total_seconds() % seconds
        return ts - dt.timedelta(seconds=rem)

    expect_tumble = Counter(floor_to(t, 3600) for t in stamps)
    expect_slide = Counter()
    for t in stamps:
        b = floor_to(t, 1800)
        expect_slide[b] += 1
        expect_slide[b - dt.timedelta(minutes=30)] += 1

    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    got_tumble = {
        row.w.start: row.n
        for row in df.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got_slide = {
        row.w.start: row.n
        for row in df.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got_tumble == dict(expect_tumble), (stamps, got_tumble, expect_tumble)
    assert got_slide == dict(expect_slide), (stamps, got_slide, expect_slide)


def test_sequence_window_count_pins_exact_multiple_boundary(spark):
    """The audio-window oracle derives the window count as CEIL(n/64); the
    Spark side derives it as sequence(0, ceil(n/64)−1). Pin the boundary
    cases — an exact 64-multiple payload must yield exactly n/64 windows
    (not one more), one byte over must add a window, and the documented
    n=0 divergence (Spark sequence auto-negates the step and yields
    [0, −1]) must stay true so the query's n > 0 filter stays load-bearing.
    """
    rows = [(1, 1), (63, 1), (64, 1), (65, 2), (128, 2), (129, 3)]
    df = spark.createDataFrame(rows, "n int, expect_windows int")
    got = df.select(
        "n",
        "expect_windows",
        F.size(
            F.sequence(
                F.lit(0).cast("long"),
                F.ceil(F.col("n") / F.lit(64.0)).cast("long") - 1,
            )
        ).alias("got_windows"),
    ).collect()
    for r in got:
        assert r.got_windows == r.expect_windows, (r.n, r.got_windows)
    zero = (
        spark.range(1)
        .select(F.sequence(F.lit(0).cast("long"), F.lit(-1).cast("long")).alias("s"))
        .collect()[0]
        .s
    )
    assert zero == [0, -1], zero


@_settings
@given(
    st.lists(
        st.text(
            alphabet="abĉ台 :'0\\",  # ascii, multibyte, space, quote, escape
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_cms_grid_and_estimates_match_python_reference(spark, toks):
    """The CMS sketch (q_cms_heavy_hitters) must build the exact grid a
    pure-Python md5 reference builds — salted bucketing included — and
    every estimate must satisfy est = min over rows of the bucket sum and
    the one-sided est ≥ exact guarantee, for adversarial tokens the ASCII
    fixture never produces (multibyte UTF-8, empty string, quotes,
    backslashes). Pins the Spark-side conv/substring/md5 arithmetic to
    hashlib ground truth; the DuckDB oracle replays the same arithmetic,
    so this property is the third, engine-independent witness."""
    import hashlib
    from collections import Counter

    from als_pyspark_spark.operators.aggregates import _CMS_D, _CMS_W, _cms_bucket

    exact = Counter(toks)

    def bucket(j, tok):
        h = hashlib.md5(f"cms{j}:{tok}".encode("utf-8")).hexdigest()
        return int(h[:8], 16) % _CMS_W

    grid = Counter()
    for tok, cnt in exact.items():
        for j in range(_CMS_D):
            grid[(j, bucket(j, tok))] += cnt

    df = spark.createDataFrame([(t,) for t in toks], "token string")
    tf = df.groupBy("token").agg(F.count("*").alias("cnt"))
    got_grid = {
        (row.j, row.bucket): row.c
        for row in tf.select(
            "cnt", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j"), "token"
        )
        .select("j", _cms_bucket(F.col("j"), F.col("token")).alias("bucket"), "cnt")
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    }
    assert got_grid == dict(grid), (toks, got_grid, grid)
    for tok, cnt in exact.items():
        est = min(got_grid[(j, bucket(j, tok))] for j in range(_CMS_D))
        assert est >= cnt, (tok, est, cnt)


@_settings
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=2), min_size=5, max_size=24
    )
)
def test_intra_doc_span_counts_match_bruteforce(spark, toks):
    """The sorted-run flag arithmetic behind q_dedup_intra_doc_spans must
    equal a brute-force Counter over the naive gram list for ANY token
    sequence — a two-letter alphabet forces dense gram collisions, the
    regime where run boundaries (first-of-run vs continuation) can be
    miscounted. Counts checked: total positions, positions whose gram
    occurs ≥2 times, distinct repeated grams."""
    import tempfile
    from collections import Counter

    from als_pyspark_spark.registry import load_all_queries

    text = " ".join(toks)
    grams = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
    c = Counter(grams)
    want = (
        len(grams),
        sum(v for v in c.values() if v >= 2),
        sum(1 for v in c.values() if v >= 2),
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        [row] = (
            load_all_queries()["q_dedup_intra_doc_spans"].build(spark, d).collect()
        )
    got = (row.n_grams, row.n_repeated_positions, row.n_distinct_repeated)
    assert got == want, (toks, got, want)


@_settings
@given(
    st.lists(
        st.lists(st.sampled_from(["p", "q"]), min_size=0, max_size=70).map(
            " ".join
        ),
        min_size=1,
        max_size=4,
    )
)
def test_chunk_level_dedup_matches_bruteforce(spark, texts):
    """q_dedup_chunk_level vs a brute-force Counter over naive 32-token
    windowing: a two-symbol alphabet makes cross-doc chunk collisions
    near-certain, exercising the cnt>=2 window logic; docs under 32
    tokens must vanish entirely (no full chunk)."""
    import tempfile
    from collections import Counter

    from als_pyspark_spark.registry import load_all_queries

    W = 32
    chunks = {}
    for i, t in enumerate(texts):
        toks = t.split(" ") if t else [""]
        chunks[i] = [
            " ".join(toks[k * W : (k + 1) * W]) for k in range(len(toks) // W)
        ]
    c = Counter(ch for lst in chunks.values() for ch in lst)
    want = {
        i: (len(lst), sum(1 for ch in lst if c[ch] >= 2))
        for i, lst in chunks.items()
        if lst
    }
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r.doc_id: (r.n_chunks, r.n_dup_chunks)
            for r in load_all_queries()["q_dedup_chunk_level"]
            .build(spark, d)
            .collect()
        }
    assert got == want, (texts, got, want)


@_settings
@given(
    st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=25)
)
def test_substring_interval_union_fold_matches_bruteforce(spark, positions):
    """The exact-substring span fold (dedup/queries.py): for ANY set of
    duplicated window start positions, dup_tokens must equal the
    brute-force SIZE of the union of covered intervals [p, p+K-1]
    (convention-independent), and n_spans must follow the documented
    merge rule — windows merge iff their starts are ≤ K-1 apart, i.e.
    they strictly OVERLAP. Two windows whose coverage merely TOUCHES
    (start gap exactly K) stay separate spans — both the Spark fold and
    the DuckDB LAG/SUM oracle implement that convention (hypothesis
    found the boundary; the engines agree with each other, which is
    what the exact oracle pins). The fold is gap-threshold arithmetic,
    and hypothesis hunts the off-by-one boundaries."""
    from als_pyspark_spark.dedup.queries import _SS_K

    ps = sorted(set(positions))
    covered = set()
    for p in ps:
        covered.update(range(p, p + _SS_K))
    spans = 0
    prev = None
    for p in ps:  # documented rule: new span iff start gap > K-1
        if prev is None or p - prev > _SS_K - 1:
            spans += 1
        prev = p
    want = (spans, len(covered))

    # run the SAME fold expression the query uses, over a one-row frame
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(sorted(set(positions)),)], "ps array<long>")
    far = -(10**9)
    init = F.struct(
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("toks"),
        F.lit(far).cast("long").alias("start"),
        F.lit(far).cast("long").alias("prev"),
    )
    fold = F.aggregate(
        F.col("ps"),
        init,
        lambda acc, p: F.when(
            p - acc["prev"] <= _SS_K - 1,
            F.struct(
                acc["n_spans"].alias("n_spans"),
                acc["toks"].alias("toks"),
                acc["start"].alias("start"),
                p.cast("long").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                (acc["n_spans"] + 1).alias("n_spans"),
                (
                    acc["toks"]
                    + F.when(
                        acc["n_spans"] > 0, acc["prev"] - acc["start"] + _SS_K
                    ).otherwise(F.lit(0).cast("long"))
                ).alias("toks"),
                p.cast("long").alias("start"),
                p.cast("long").alias("prev"),
            )
        ),
        lambda acc: F.struct(
            acc["n_spans"].alias("n_spans"),
            (acc["toks"] + acc["prev"] - acc["start"] + _SS_K)
            .cast("long")
            .alias("dup_tokens"),
        ),
    )
    r = df.select(fold.alias("s")).select("s.n_spans", "s.dup_tokens").collect()[0]
    assert (r.n_spans, r.dup_tokens) == want, (ps, (r.n_spans, r.dup_tokens), want)


@settings(max_examples=300, deadline=None)
@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=40), min_size=1, max_size=20),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_filter_candidate_rule_is_complete(sets):
    """The PPJoin candidate rule q_dedup_jaccard_prefix_join relies on,
    falsification-tested in pure Python: for EVERY pair with
    J(A,B) >= tau, the rarest-first prefixes must share an element AND
    survive the length + positional filters — if hypothesis finds a
    qualifying pair the rule misses, the Spark query is incomplete by
    construction (its oracle would agree, so the driver gate could
    never catch it).

    The property additionally imposes the AllPairs asymmetric INDEX
    prefix on the smaller set (pos <= n - ceil(2tau/(1+tau)*n) + 1) —
    STRICTER than the shipped join, so its completeness implies the
    shipped rule's. The stricter form is deliberately NOT shipped:
    measured on the sf1 corpus it prunes exactly 0 of the 17.2M
    post-positional candidates (equal-size near-dup clusters make the
    positional filter subsume it), so it would be dead weight in the
    join condition."""
    import math

    tau = 0.5
    # global order: document frequency asc, element asc (the query's rank)
    df: dict[int, int] = {}
    for s in sets:
        for x in s:
            df[x] = df.get(x, 0) + 1
    order = {x: i for i, x in enumerate(sorted(df, key=lambda x: (df[x], x)))}

    def prefix_with_pos(s):
        ranked = sorted(s, key=lambda x: order[x])
        ell = len(s) - math.ceil(tau * len(s)) + 1
        return {x: i + 1 for i, x in enumerate(ranked[:ell])}  # 1-based rn

    pres = [prefix_with_pos(s) for s in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            jac = len(a & b) / len(a | b)
            if jac < tau:
                continue
            na, nb = len(a), len(b)
            # length filter must pass for every qualifying pair
            assert tau * nb <= na and tau * na <= nb, (a, b)
            # some shared PREFIX element must also pass the positional
            # filter (the query prunes rows, keeps pairs where ANY row
            # survives)
            alpha = (na + nb + 2) // 3
            # role for the asymmetric index prefix: smaller set, ties by
            # position (the query's doc_a < doc_b orientation makes that
            # "a when sizes are equal")
            a_small = na <= nb
            def idx_ok(x):
                if a_small:
                    return pres[i][x] <= na - (2 * na + 2) // 3 + 1
                return pres[j][x] <= nb - (2 * nb + 2) // 3 + 1
            survivors = [
                x
                for x in (pres[i].keys() & pres[j].keys())
                if 1 + min(na - pres[i][x], nb - pres[j][x]) >= alpha
                and idx_ok(x)
            ]
            assert survivors, (
                f"complete-rule violation: J={jac:.3f} pair {sorted(a)} / "
                f"{sorted(b)} has no surviving prefix meeting"
            )


@settings(max_examples=200, deadline=None)
@given(
    base=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=25), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    ),
    clones=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=12),
)
def test_clone_class_expansion_equals_doc_level(base, clones):
    """The clone-class rewrite of the pairwise dedup tiers, modeled end to
    end in pure Python: group identical shingle sets, run the prefix
    candidate rule + tau-verify over DISTINCT sets only, expand class
    pairs + intra-class pairs — the result must equal the doc-level
    brute force over every corpus hypothesis can build, including
    all-clone corpora, singleton classes and cross-class near-dups."""
    import itertools
    import math

    tau = 0.5
    # corpus: each doc is a clone of one base set (forced clone classes)
    docs = {i: base[c % len(base)] for i, c in enumerate(clones)}

    # brute-force doc-level truth
    want = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        j = len(docs[a] & docs[b]) / len(docs[a] | docs[b])
        if j >= tau:
            want[(a, b)] = j

    # clone-class pipeline model
    classes: dict[frozenset, list[int]] = {}
    for i, s in docs.items():
        classes.setdefault(s, []).append(i)
    sets = list(classes)
    df: dict[int, int] = {}
    for s in sets:
        for x in s:
            df[x] = df.get(x, 0) + 1
    order = {x: i for i, x in enumerate(sorted(df, key=lambda x: (df[x], x)))}

    def prefix_pos(s):
        ranked = sorted(s, key=lambda x: order[x])
        ell = len(s) - math.ceil(tau * len(s)) + 1
        return {x: i + 1 for i, x in enumerate(ranked[:ell])}

    pres = {s: prefix_pos(s) for s in sets}
    got = {}
    for sa, sb in itertools.combinations(sets, 2):
        na, nb = len(sa), len(sb)
        alpha = (na + nb + 2) // 3
        meet = [
            x
            for x in (pres[sa].keys() & pres[sb].keys())
            if tau * nb <= na and tau * na <= nb
            and 1 + min(na - pres[sa][x], nb - pres[sb][x]) >= alpha
        ]
        if not meet:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j < tau:
            continue
        for ia in classes[sa]:
            for ib in classes[sb]:
                got[(min(ia, ib), max(ia, ib))] = j
    for members in classes.values():
        for ia, ib in itertools.combinations(sorted(members), 2):
            got[(ia, ib)] = 1.0

    assert got == want
