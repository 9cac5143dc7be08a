"""Snapshot each registry query's source + oracle hash.

Run at the END of a round, after the verification window (_HOISTED) is
final: the upcoming driver sweep then verifies exactly the code this
snapshot records. During the next round,
tests/test_registry.py::test_changed_queries_are_hoisted compares live
hashes against the snapshot — any query whose implementation changed
since its last driver evidence must sit in the new round's window (the
automated form of the round-3 ADVICE item: driver rows older than the
query's last code change are not evidence).

Granularity caveat: the hash covers the build function's own source and
its oracle SQL, not helper functions it calls — a helper-level behavior
change (e.g. rewriting word_ngrams) still needs a manual hoist decision,
as in round 3.

Usage: python scripts/snapshot_query_sources.py
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from als_pyspark_spark.registry import load_all_queries

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "query_source_hashes.json",
)


def query_hash(q) -> str:
    src = inspect.getsource(q.build)
    return hashlib.sha256((src + "\n" + (q.oracle or "")).encode()).hexdigest()


def main() -> int:
    hashes = {name: query_hash(q) for name, q in load_all_queries().items()}
    with open(SNAPSHOT, "w") as f:
        json.dump(hashes, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"{len(hashes)} query hashes -> {SNAPSHOT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
