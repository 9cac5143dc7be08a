"""Session-factory hygiene: checkpoint-directory lifecycle.

Spark creates ``<base>/<uuid>`` per context and never deletes it, so
without active cleanup every run leaks its checkpointed RDDs to disk
permanently (309 MB / 207 orphan dirs had accumulated by round 8). The
factory owns three guards: a GC-driven in-session cleaner config, an
atexit removal of the session's own dir, and a startup sweep of stale
dirs from crashed sessions — the sweep is the pure-filesystem piece
tested directly here.
"""

from __future__ import annotations

import os
import time

from als_pyspark_spark.session import _sweep_stale_checkpoints


def _mkdir_with_age(base, name: str, age_s: float) -> str:
    path = os.path.join(str(base), name)
    os.makedirs(path)
    # plant a file so rmtree has real work, then age the dir itself
    with open(os.path.join(path, "part-0"), "w") as f:
        f.write("x")
    old = time.time() - age_s
    os.utime(path, (old, old))
    return path


def test_sweep_removes_only_stale_dirs(tmp_path):
    stale = _mkdir_with_age(tmp_path, "dead-session", age_s=4 * 3600)
    fresh = _mkdir_with_age(tmp_path, "live-session", age_s=60)
    _sweep_stale_checkpoints(str(tmp_path), max_age_s=3 * 3600)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)


def test_sweep_ignores_plain_files_and_missing_base(tmp_path):
    # a stray file at the base level is not a checkpoint dir — left alone
    stray = os.path.join(str(tmp_path), "notes.txt")
    with open(stray, "w") as f:
        f.write("keep")
    old = time.time() - 10 * 3600
    os.utime(stray, (old, old))
    _sweep_stale_checkpoints(str(tmp_path), max_age_s=3 * 3600)
    assert os.path.exists(stray)
    # nonexistent base is a silent no-op, not an error
    _sweep_stale_checkpoints(os.path.join(str(tmp_path), "nope"))


def test_session_has_checkpoint_dir_and_cleaner(spark):
    own = spark.sparkContext.getCheckpointDir()
    assert own and ".scratch/checkpoints" in own
    assert (
        spark.conf.get("spark.cleaner.referenceTracking.cleanCheckpoints")
        == "true"
    )
