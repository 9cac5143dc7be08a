"""Assemble the round's three-decade scaling record: run bench.py at
sf0.01 / sf0.1 / sf1 back-to-back on this host and collect each run's
FULL json (BENCH_full_last.json — stdout only carries the compact
driver-contract line since round 9) into BENCH_SCALING_r{N}.json keyed
"0.01"/"0.1"/"1.0". Same-session-epoch records are the only per-query
perf signal this shared box supports (PERF.md noise discipline).

Usage: python scripts/record_scaling.py <round-number> [sf1_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rnd = int(sys.argv[1])
    sf1_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".scale", "sf1")
    tiers = [
        ("0.01", "/root/testdata/sf0.01"),
        ("0.1", "/root/testdata/sf0.1"),
        ("1.0", sf1_dir),
    ]
    out = {}
    full_path = os.path.join(REPO, "BENCH_full_last.json")
    for key, sf_dir in tiers:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if r.returncode != 0:
            print(r.stdout[-1000:] + r.stderr[-1000:])
            return 1
        with open(full_path) as f:
            out[key] = json.load(f)
        # round-10 ADVICE: bench.py exits 0 even when it could not write
        # BENCH_full_last.json (read-only FS path only warns), so a stale
        # previous run could silently be recorded under this tier's key.
        # The record's own "sf" field must match the tier we just ran.
        got_sf = out[key].get("sf")
        want_sf = float(key)
        if got_sf != want_sf:
            print(
                f"stale {full_path}: sf={got_sf} but tier {key} just ran "
                f"({sf_dir}) — bench.py failed to write its record"
            )
            return 1
        print(f"sf{key}: {out[key]['value']}s ({len(out[key]['queries'])} queries)")
    path = os.path.join(REPO, f"BENCH_SCALING_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"-> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
