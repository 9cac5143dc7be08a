"""Capture .explain("formatted") for named queries into files.

Usage: python scripts/capture_plans.py <outdir> <suffix> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt per query (e.g. suffix 'before' /
'after' for optimization-round evidence). Queries that materialize
eagerly through caching.collected() are resolved through the same lazy
plan helpers the explain audit uses, so the file shows the distributed
plan, not a bounded LocalRelation.
"""

from __future__ import annotations

import importlib
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from als_pyspark_spark.registry import load_all_queries
from als_pyspark_spark.session import build_session

# Same lazy-plan table as scripts/explain_audit.py (import it to stay in sync)
from explain_audit import _LAZY_PLANS  # noqa: E402


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = build_session("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all_queries()
    for name in names:
        if name in _LAZY_PLANS:
            mod, fn = _LAZY_PLANS[name]
            plan = getattr(importlib.import_module(mod), fn)(spark, sf_dir)
            df = plan[0] if isinstance(plan, tuple) else plan
        else:
            df = queries[name].build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
