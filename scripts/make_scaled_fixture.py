"""Scale the largest driver-provided fixture up by key-shifted replication.

The driver ships sf0.001/0.01/0.1; PERF.md's scaling argument needs a third
decade (sf1) to show the >2×-at-10× queries are linear, not super-linear —
at sf0.1 the suite is still overhead-dominated. No public generator for the
driver's exact schema exists in this container, so sf1 is derived from
sf0.1 deterministically: N key-shifted copies (surrogate keys offset by
10M·copy, every FK shifted consistently), dimensions (region/nation)
verbatim. No RNG — rerunning produces byte-identical tables.

Replication preserves each copy's internal distributions (skew, FK fan-out,
value ranges) and multiplies data volume — exactly what a scan/shuffle
throughput measurement needs. Oracles that derive their expectation from
the data itself (every exact query) stay valid; the one assumption clones
would break is q_embedding_neardup_pairs' isotropic-background contract
(identical vectors across copies are genuine cos=1 near-dups the planted-
pair oracle doesn't enumerate), so each embedding copy i is CIRCULARLY
ROTATED by i positions — a norm- and isotropy-preserving transform that
makes cross-copy cosines ~N(0, 1/64) while keeping the per-copy value
distribution byte-identical for throughput purposes. Duplicate TEXT across
copies remains (dedup oracles compute from the data on both sides, so
clone-dense pair outputs stay exact — just bigger; see PERF.md's simhash
note).

Usage: python scripts/make_scaled_fixture.py [out_dir] [copies]
       default: <repo>/.scale/sf1, 10 copies of sf0.1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000  # > every surrogate key in sf0.1 (max: orderkey ~600k)
                     # and > the planted-near-dup vec_id offset (1M + 20)

# table -> surrogate/FK key columns to shift per copy (None = dimension,
# copied verbatim)
KEYS: dict[str, list[str] | None] = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, ".scale", "sf1")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        if keys is None:
            sql = f"SELECT * FROM '{src}'"
        else:
            cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
            parts = []
            for i in range(copies):
                def col_expr(c: str, i: int = i) -> str:
                    if c in keys:
                        return f"{c} + {i * OFFSET} AS {c}"
                    if table == "embeddings" and c == "embedding" and i > 0:
                        # circular rotation by i: distinct, norm-preserving
                        return (
                            f"list_concat(embedding[{i + 1}:], "
                            f"embedding[:{i}]) AS embedding"
                        )
                    return c
                sel = ", ".join(col_expr(c) for c in cols)
                parts.append(f"SELECT {sel} FROM '{src}'")
            sql = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")
    con.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
