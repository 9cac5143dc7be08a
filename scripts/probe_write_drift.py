"""One-shot decomposition of the two write-path queries whose sf1 epoch
readings drifted ~1.8x between rounds 11 and 13 with plans provably
unchanged (VERDICT r13 item 5): attribute their time to compute vs file
I/O so future epoch drift can be classified instead of re-adjudicated.

Usage: python scripts/probe_write_drift.py [sf_dir] [passes]

q_zorder_layout_sink splits into
  A  compute+range-shuffle+sort, noop sink (no parquet encode, no disk)
  B  the real parquet write           -> B - A = encode + disk I/O
  C  the read-back bucket aggregate
q_stream_tumbling_hourly splits into
  D  the batch twin of the windowed agg (pure compute baseline)
  E  availableNow drain, checkpoint on tmpfs (/dev/shm)
  F  availableNow drain, checkpoint on disk  -> F - E = checkpoint disk I/O,
                                                E - D = streaming machinery
All stages run `passes` times warm; min and spread are reported with
loadavg so host contention is self-evident (PERF.md bench-noise rule).
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from als_pyspark_spark.session import build_session
from als_pyspark_spark.sources.sinks import _morton_spread, app_scratch
from als_pyspark_spark.sources.tables import load_table
from als_pyspark_spark.streaming.events import read_events_stream, tumbling_hourly


def timed(fn, passes):
    outs = []
    for _ in range(passes):
        t0 = time.time()
        fn()
        outs.append(time.time() - t0)
    return outs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session("probe-write-drift")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# sf_dir={sf_dir} passes={passes} loadavg_start={os.getloadavg()}")

    # --- q_zorder_layout_sink decomposition -------------------------------
    cx = "(o_custkey % 1024)"
    dy = "(DATEDIFF(CAST(o_orderdate AS DATE), DATE '1992-01-01') % 1024)"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(cx).alias("cx"), F.expr(dy).alias("dy")
    )
    z = o.withColumn(
        "zval", F.expr(f"{_morton_spread('cx')} | ({_morton_spread('dy')} << 1)")
    )
    laid = z.repartitionByRange(16, "zval").sortWithinPartitions("zval")
    out = app_scratch(spark, "probe_zorder")

    res = {}
    res["z_A_noop_compute"] = timed(
        lambda: laid.write.format("noop").mode("overwrite").save(), passes
    )
    res["z_B_parquet_write"] = timed(
        lambda: laid.write.mode("overwrite").parquet(out), passes
    )
    back = spark.read.parquet(out)
    agg = back.groupBy(F.expr("zval >> 16").cast("long").alias("z_bucket")).agg(
        F.count("*").alias("n_rows")
    )
    res["z_C_readback_agg"] = timed(lambda: agg.collect(), passes)

    # --- q_stream_tumbling_hourly decomposition ---------------------------
    ev = load_table(spark, sf_dir, "events")
    batch_twin = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("v"))
    )
    res["s_D_batch_twin"] = timed(lambda: batch_twin.collect(), passes)

    def drain(ckpt_base):
        name = f"probe_drain_{uuid.uuid4().hex[:8]}"
        ckpt = os.path.join(ckpt_base, name)
        q = (
            tumbling_hourly(read_events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.table(name).collect()
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)

    shm = "/dev/shm/probe_ckpt" if os.path.isdir("/dev/shm") else None
    if shm:
        os.makedirs(shm, exist_ok=True)
        res["s_E_drain_ckpt_tmpfs"] = timed(lambda: drain(shm), passes)
        shutil.rmtree(shm, ignore_errors=True)
    disk = app_scratch(spark, "probe_ckpt_disk")
    res["s_F_drain_ckpt_disk"] = timed(lambda: drain(disk), passes)

    print(f"# loadavg_end={os.getloadavg()}")
    for k, v in res.items():
        print(f"{k}: min={min(v):.2f}s passes={[round(x, 2) for x in v]}")
    spark.stop()


if __name__ == "__main__":
    main()
