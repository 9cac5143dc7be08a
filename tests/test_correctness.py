"""Oracle gate over the full registry — pytest mirror of
scripts/check_correctness.py (one test per query, so failures localize).

Canonicalization mirrors the DRIVER's (pandas ``sort_values``), not a
repr-sort: see als_pyspark_spark/canon.py for why (round-5 red rows).
"""

from __future__ import annotations

import pytest

from als_pyspark_spark.canon import assert_dtype_parity, assert_scalar_schema, canon
from als_pyspark_spark.registry import load_all_queries, requirements_met

QUERIES = load_all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, sf_dir, duck):
    q = QUERIES[name]
    if not requirements_met(q):
        pytest.skip(f"optional dependency absent: {q.requires}")
    sdf = q.build(spark, sf_dir)
    # Driver-contract lint: complex top-level output types break the
    # driver's canonicalizer even when the values are right.
    assert_scalar_schema(sdf.schema, name)
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only contract: must run and have a stable schema
        assert sdf.schema is not None
        return
    # fetchdf(), not fetchall(): the driver compares through pandas, and
    # fetchall()'s Python ints erase the dtype divergence class that made
    # round 6's red row (DuckDB HUGEINT -> pandas float64 vs Spark int64).
    d_df = duck.execute(q.oracle).fetchdf()
    d_cols = list(d_df.columns)
    assert sorted(sdf.columns) == sorted(d_cols), f"{sdf.columns} vs {d_cols}"
    d_df = d_df[list(sdf.columns)]
    assert_dtype_parity(s_rows, d_df, sdf.columns, name)
    d_rows = list(d_df.itertuples(index=False, name=None))
    cs, cd = canon(s_rows, sdf.columns), canon(d_rows, sdf.columns)
    assert len(cs) == len(cd), f"rowcount {len(cs)} != {len(cd)}"
    assert cs == cd, f"first diff: {next((a, b) for a, b in zip(cs, cd) if a != b)}"
