"""SparkSession factory tuned for this engine.

Defaults are chosen for the local[32]/128GiB test box but every knob is the
one you would also set on a 1000-executor cluster:

- AQE on (runtime re-plan: coalesce shuffle partitions, skew-join split).
- Arrow on (vectorized pandas UDF / toPandas transfers).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle regardless of host TZ.
- shuffle.partitions sized to cores locally; on a real cluster this scales
  with executors (AQE coalesces the excess, so over-provisioning is safe).
"""

from __future__ import annotations

import atexit
import os
import shutil
import time

from pyspark.sql import SparkSession


def _sweep_stale_checkpoints(base: str, max_age_s: float = 3 * 3600) -> None:
    """Delete checkpoint subdirectories left behind by DEAD sessions.

    Spark never removes a session's checkpoint directory (it only creates
    ``<base>/<uuid>`` per context), so crashed or kill -9'd runs leak disk
    forever — 309 MB had accumulated across eight rounds before this sweep
    existed. Age-gating (default 3 h, comfortably above the longest local
    job: the ~68 min full-registry sf1 gate) keeps the sweep safe against
    checkpoint dirs owned by CONCURRENT live sessions on the same box.
    On a cluster the same hygiene applies to the HDFS/S3 checkpoint path
    (lifecycle rules are the usual tool there)."""
    try:
        entries = os.listdir(base)
    except OSError:
        return
    cutoff = time.time() - max_age_s
    for name in entries:
        path = os.path.join(base, name)
        try:
            if os.path.isdir(path) and os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def build_session(
    app_name: str = "als-pyspark-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Local mode: driver heap is the only memory knob. 16g is measured
        # flat vs 8g at sf0.1 while giving sf1+ headroom; 48g measured 2x
        # SLOWER end-to-end (heap commit + GC region overhead dominates).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Recursive CTEs: the default 1M-row limit is a runaway-recursion
        # guard sized for toy queries — a log-depth hierarchy walk over a
        # real table exceeds it by SF ~0.5 (q_recursive_referral_depth
        # needs ~n·log2(n) rows: ~31M at sf1). The level limit (100)
        # stays: depth, not volume, is what catches a non-terminating
        # recursion.
        .config("spark.sql.cteRecursionRowLimit", str(1_000_000_000))
        # Delete a checkpointed RDD's files as soon as the driver GCs its
        # last reference — without this, a session that runs the iterative
        # CC queries many times (gate sweeps, bench passes) accumulates
        # every superseded round's checkpoint on disk until JVM exit.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Checkpointing support (reference declares check_point_interval but
    # never implements it — ALS.py:36,101 defect; MLlib's works but SKIPS
    # silently unless a checkpoint dir exists). Lineage truncation is what
    # keeps iterative jobs (ALS, KMeans) plannable past ~10 iterations.
    if spark.sparkContext.getCheckpointDir() is None:
        base = os.path.abspath(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "..",
                ".scratch",
                "checkpoints",
            )
        )
        _sweep_stale_checkpoints(base)
        spark.sparkContext.setCheckpointDir(base)
        # Remove OUR uuid subdir at interpreter exit (covers clean exits;
        # the startup sweep above covers crashed ones). getCheckpointDir
        # returns a file: URI in local mode — strip the scheme.
        own = spark.sparkContext.getCheckpointDir()
        if own and own.startswith("file:"):
            atexit.register(
                shutil.rmtree, own.removeprefix("file:"), ignore_errors=True
            )
    return spark
