"""Snapshot each registry query's source + oracle hash.

Run at the END of a round, after the verification window (_HOISTED) is
final: the upcoming driver sweep then verifies exactly the code this
snapshot records. During the next round,
tests/test_registry.py::test_changed_queries_are_hoisted compares live
hashes against the snapshot — any query whose implementation changed
since its last driver evidence must sit in the new round's window (the
automated form of the round-3 ADVICE item: driver rows older than the
query's last code change are not evidence).

Granularity (round-5 upgrade): the fingerprint covers the build
function's source, its oracle SQL, AND every package-internal helper
transitively reachable from the build function (module globals and local
imports alike) — see registry.query_fingerprint. A helper-only rewrite
(the word_ngrams class of change that caused round-3 hoist debt) now
flips the fingerprint of every query that reaches the helper, so the
freshness invariant is mechanical, not a manual hoist decision.

Round-12 upgrade: module-level scalar CONSTANTS referenced by reachable
code enter the fingerprint too (repr of package-module ints/floats/strs/
tuples). A tuning-knob retune (_PQ_NPROBE = 8 → 12) changes query output
without touching any function's source, so the source-only hash silently
kept stale driver evidence alive — the r11 shortlist retune was hoisted
by hand; test_constant_knob_edit_flips_fingerprint pins the mechanical
form.

Usage: python scripts/snapshot_query_sources.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from als_pyspark_spark.registry import load_all_queries, query_fingerprint

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "query_source_hashes.json",
)


def main() -> int:
    hashes = {name: query_fingerprint(q) for name, q in load_all_queries().items()}
    with open(SNAPSHOT, "w") as f:
        json.dump(hashes, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"{len(hashes)} query hashes -> {SNAPSHOT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
