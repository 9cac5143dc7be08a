"""Property-based tests for als_pyspark_spark.canon — the comparator the
whole oracle gate (and therefore every correctness claim) rests on since
round 6. Pure Python (no Spark job per example), so hypothesis can run at
full volume.

The driver's contract being modeled: load both engines' results into
pandas, ``sort_values`` over every column (sorted by name), then compare
values elementwise. The properties below pin the three load-bearing
behaviors: multiset semantics (row/column order never matters), tolerance
(sub-rounding float noise never matters, NULLs compare equal across
engines), and strictness (anything the driver cannot canonicalize —
list/dict cells — must raise HERE, not pass locally and fail there).
"""

from __future__ import annotations

import random
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from als_pyspark_spark.canon import assert_scalar_schema, canon

_settings = settings(max_examples=200, deadline=None)

# a scalar cell as both engines may hand it back: int, float, str, bool,
# Decimal, or NULL
cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
    st.text(max_size=8),
    st.booleans(),
    st.decimals(
        min_value=-(10**12), max_value=10**12, places=4, allow_nan=False, allow_infinity=False
    ),
)


def _typed_rows(draw_cols: int):
    """Rows whose columns are each type-homogeneous-or-NULL, like real
    engine output (pandas cannot sort a column mixing str and int)."""
    col_strats = st.lists(
        st.sampled_from(
            [
                st.none() | st.integers(min_value=-(2**40), max_value=2**40),
                st.none()
                | st.floats(
                    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
                ),
                st.none() | st.text(max_size=8),
                st.none() | st.booleans(),
                st.none()
                | st.decimals(
                    min_value=-(10**12),
                    max_value=10**12,
                    places=4,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ]
        ),
        min_size=draw_cols,
        max_size=draw_cols,
    )
    return col_strats.flatmap(
        lambda cols: st.lists(
            st.tuples(*cols), min_size=0, max_size=12
        )
    )


@_settings
@given(rows=_typed_rows(3), seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_row_order_never_matters(rows, seed):
    """canon is a multiset fingerprint: any permutation of the same rows
    canonicalizes identically — the property that lets Spark and DuckDB
    return rows in arbitrary (partition/vector) order."""
    cols = ["a", "b", "c"]
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    assert canon(rows, cols) == canon(shuffled, cols)


@_settings
@given(rows=_typed_rows(3))
def test_column_order_never_matters(rows):
    """The driver aligns columns by NAME, so presenting the same data with
    columns permuted (rows permuted to match) must canonicalize equal —
    the reason every aggregate is aliased identically on both sides."""
    cols = ["a", "b", "c"]
    perm = [2, 0, 1]
    p_cols = [cols[i] for i in perm]
    p_rows = [tuple(r[i] for i in perm) for r in rows]
    assert canon(rows, cols) == canon(p_rows, p_cols)


@_settings
@given(
    rows=st.lists(
        st.tuples(
            st.text(max_size=4),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        ),
        max_size=10,
    ),
    noise=st.floats(min_value=-1e-11, max_value=1e-11),
)
def test_sub_rounding_float_noise_never_matters(rows, noise):
    """Engine ulp differences below the 9-digit rounding must never flip
    the fingerprint — including via sort-order inversions of near-ties
    (floats are rounded BEFORE the sort for exactly this reason).

    Rounding is a step function, so noise CAN legitimately flip a cell
    that sits within the noise band of a half-multiple of 1e-9 (e.g.
    round(1.5e-9) != round(1.5e-9 + 1e-11)); the true invariant is that
    canon agrees whenever the per-cell roundings agree — assume() the
    boundary cases away instead of asserting a false property."""
    from hypothesis import assume

    cols = ["k", "v"]
    noisy = [(k, v + noise) for k, v in rows]
    assume(
        all(round(a[1], 9) == round(b[1], 9) for a, b in zip(rows, noisy))
    )
    assert canon(rows, cols) == canon(noisy, cols)


@_settings
@given(rows=_typed_rows(2))
def test_canon_is_idempotent_fingerprint(rows):
    """Comparing a result set to itself always succeeds (no NaN != NaN
    style self-inequality smuggled in by the pandas round-trip — the
    regression the None-restore exists for)."""
    cols = ["x", "y"]
    assert canon(rows, cols) == canon(rows, cols)


def test_none_in_numeric_column_compares_equal_across_engines():
    """Spark hands back None; pandas coerces it to NaN inside float
    columns; the restore must make both sides meet at None again (a NULL
    both engines agree on must never fail the compare)."""
    cols = ["k", "v"]
    spark_side = [("a", 1.5), ("b", None), ("c", 2.5)]
    duck_side = [("b", None), ("c", 2.5), ("a", 1.5)]
    got = canon(spark_side, cols)
    assert got == canon(duck_side, cols)
    assert any(v is None for _, v in got), "None must survive, not become NaN"


def test_none_only_and_empty_results():
    assert canon([], ["a", "b"]) == []
    assert canon([(None, None)], ["a", "b"]) == [(None, None)]


def test_nul_byte_strings_sort_deterministically():
    """Pinned round-10 hypothesis counterexample: pandas' multi-column
    sort factorizes object columns through numpy fixed-width unicode,
    where a trailing '\\x00' is padding — '' and '\\x00' tied and the
    stable mergesort leaked input row order into the canonical form.
    The UTF-8-bytes sort key (canon.py _canon_frame) must break the tie
    identically for every permutation."""
    cols = ["a", "b", "c"]
    rows = [("", None, ""), ("", None, "\x00")]
    assert canon(rows, cols) == canon(list(reversed(rows)), cols)
    # and the broader NUL family: padding at depth, interior NULs, ties
    # across multiple sort columns
    rows2 = [("x", 1, "ab"), ("x", 1, "ab\x00"), ("x", 1, "ab\x00\x00")]
    expect = canon(rows2, cols)
    for perm in (
        [rows2[2], rows2[0], rows2[1]],
        [rows2[1], rows2[2], rows2[0]],
        list(reversed(rows2)),
    ):
        assert canon(perm, cols) == expect


@_settings
@given(
    rows=_typed_rows(2),
    bad=st.sampled_from([[1, 2], {"k": 1}, [[1]], {1, 2}]),
    pos=st.integers(min_value=0, max_value=20),
)
def test_unhashable_cells_raise_wherever_they_hide(rows, bad, pos):
    """A list/dict/set cell anywhere in the result must raise TypeError —
    mirroring the driver's sort_values failure — even when every other
    row is clean (the round-5 red rows passed the old repr-sort gate)."""
    cols = ["x", "y"]
    poisoned = list(rows)
    poisoned.insert(min(pos, len(poisoned)), ("k", bad))
    with pytest.raises(TypeError):
        canon(poisoned, cols)


def test_scalar_schema_lint_names_the_offender():
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ok", T.StringType()),
            T.StructField("payload", T.ArrayType(T.LongType())),
        ]
    )
    with pytest.raises(TypeError, match="payload"):
        assert_scalar_schema(schema, "q_example")


@_settings
@given(rows=_typed_rows(3))
def test_dtype_parity_accepts_identical_load_paths(rows):
    """assert_dtype_parity is reflexive: a pandas frame built from the
    same rows the Spark side produced can never be flagged — the check
    must only fire on genuine cross-engine dtype divergence, never on
    the comparison machinery itself."""
    import pandas as pd

    from als_pyspark_spark.canon import assert_dtype_parity

    cols = ["a", "b", "c"]
    df = pd.DataFrame(rows, columns=cols)
    assert_dtype_parity(rows, df, cols, "reflexive")  # must not raise


@_settings
@given(
    vals=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=12
    )
)
def test_dtype_parity_flags_int_column_materialized_as_float(vals):
    """The round-6 red-row shape, generalized: ANY integer column whose
    oracle frame arrives as floats (the HUGEINT→float64 pandas path)
    must raise — even though every value compares equal in Python."""
    import pandas as pd

    from als_pyspark_spark.canon import assert_dtype_parity

    rows = [(v,) for v in vals]
    floated = pd.DataFrame({"n": [float(v) for v in vals]})
    with pytest.raises(TypeError, match="dtype divergence"):
        assert_dtype_parity(rows, floated, ["n"], "hugeint_shape")


def test_dtype_parity_skips_signal_free_columns():
    """All-NULL columns (either side) and empty results carry no dtype
    signal — pandas types them by accident of the load path, so they
    must never flag."""
    import pandas as pd

    from als_pyspark_spark.canon import assert_dtype_parity

    # empty: nothing to compare
    assert_dtype_parity([], pd.DataFrame({"n": []}), ["n"], "empty")
    # all-NULL on the spark side (object column) vs float64 NaN oracle
    rows = [(None,), (None,)]
    oracle = pd.DataFrame({"n": [float("nan"), float("nan")]})
    assert_dtype_parity(rows, oracle, ["n"], "all_null")
    # NULL-bearing int column: BOTH loads coerce to float64 — parity holds
    rows2 = [("a", 1), ("b", None)]
    oracle2 = pd.DataFrame({"k": ["a", "b"], "n": [1.0, float("nan")]})
    assert_dtype_parity(rows2, oracle2[["k", "n"]], ["k", "n"], "nullable_int")


def test_decimal_and_float_columns_keep_distinct_identity():
    """Decimal cells (DuckDB DECIMAL) are not floats: canon must not
    round or coerce them — exactness discipline means the ENGINES are
    responsible for emitting identical decimals, and canon must not
    paper over a real mismatch."""
    cols = ["d"]
    a = canon([(Decimal("1.2345678901234"),)], cols)
    b = canon([(Decimal("1.2345678901235"),)], cols)
    assert a != b
