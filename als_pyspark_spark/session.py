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

import os

from pyspark.sql import SparkSession


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
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Checkpointing support (reference declares check_point_interval but
    # never implements it — ALS.py:36,101 defect; MLlib's works but SKIPS
    # silently unless a checkpoint dir exists). Lineage truncation is what
    # keeps iterative jobs (ALS, KMeans) plannable past ~10 iterations.
    if spark.sparkContext.getCheckpointDir() is None:
        ckpt = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", ".scratch", "checkpoints"
        )
        spark.sparkContext.setCheckpointDir(os.path.abspath(ckpt))
    return spark
