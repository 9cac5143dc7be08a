"""Oracle gate over the full registry — pytest mirror of
scripts/check_correctness.py (one test per query, so failures localize).
"""

from __future__ import annotations

import pytest

from als_pyspark_spark.registry import load_all_queries, requirements_met

QUERIES = load_all_queries()


def canon(rows, ndigits=9):
    out = []
    for row in rows:
        out.append(
            tuple(round(v, ndigits) if isinstance(v, float) else v for v in row)
        )
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, sf_dir, duck):
    q = QUERIES[name]
    if not requirements_met(q):
        pytest.skip(f"optional dependency absent: {q.requires}")
    sdf = q.build(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only contract: must run and have a stable schema
        assert sdf.schema is not None
        return
    res = duck.execute(q.oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(d_cols), f"{sdf.columns} vs {d_cols}"
    idx = [d_cols.index(c) for c in sdf.columns]
    d_rows = [tuple(r[i] for i in idx) for r in d_rows]
    cs, cd = canon(s_rows), canon(d_rows)
    assert len(cs) == len(cd), f"rowcount {len(cs)} != {len(cd)}"
    assert cs == cd, f"first diff: {next((a, b) for a, b in zip(cs, cd) if a != b)}"
