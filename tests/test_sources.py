

def test_python_datasource_writer_commit_manifest(spark, sf_dir):
    """The writer's two-phase commit: every committed task file is listed
    in the manifest, and the manifest covers exactly the files read back."""
    import json
    import os

    from als_pyspark_spark.registry import load_all_queries
    from als_pyspark_spark.sources.sinks import app_scratch

    q = load_all_queries()["q_python_datasource_write"]
    q.build(spark, sf_dir).collect()
    out = app_scratch(spark, "python_datasource_write")
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".jsonl")
    )
    assert manifest == files
    assert len(files) >= 1


def test_python_datasource_read_ignores_orphan_task_files(spark, sf_dir):
    """A crashed-then-retried task leaves an orphan part file the Python
    DataSource API cannot clean per-task; the read path must load exactly
    the manifest's committed files, so planting an orphan AFTER commit must
    not change the aggregate (regression: the read used to glob part-*)."""
    import os

    from als_pyspark_spark.registry import load_all_queries
    from als_pyspark_spark.sources.sinks import app_scratch

    q = load_all_queries()["q_python_datasource_write"]
    df = q.build(spark, sf_dir)
    clean = {r.o_orderstatus: (r.n_orders, r.total_cents) for r in df.collect()}
    out = app_scratch(spark, "python_datasource_write")
    orphan = os.path.join(out, "part-99999-deadbeef.jsonl")
    with open(orphan, "w") as f:
        f.write('{"o_orderkey": 1, "o_orderstatus": "F", "cents": 123}\n')
    try:
        poisoned = {
            r.o_orderstatus: (r.n_orders, r.total_cents) for r in df.collect()
        }
    finally:
        os.remove(orphan)
    assert poisoned == clean


def test_app_scratch_gc_respects_nested_activity(spark, tmp_path):
    """GC staleness is judged by the newest mtime in the TREE: a sibling
    whose top-level dir is >1h old but whose nested partition file is fresh
    (a partitioned sink mid-write) must survive; a fully-old sibling must
    be collected."""
    import os
    import time

    from als_pyspark_spark.sources import sinks

    old = time.time() - 7200
    scratch = str(tmp_path / "scratch")
    os.makedirs(scratch)
    orig = sinks._SCRATCH
    sinks._SCRATCH = scratch
    try:
        live = os.path.join(scratch, "gc_probe-otherapp-live")
        os.makedirs(os.path.join(live, "part=A"))
        with open(os.path.join(live, "part=A", "data.parquet"), "w") as f:
            f.write("x")
        # age everything except the nested file (fresh: a task still writing)
        os.utime(live, (old, old))
        os.utime(os.path.join(live, "part=A"), (old, old))

        dead = os.path.join(scratch, "gc_probe-otherapp-dead")
        os.makedirs(os.path.join(dead, "part=A"))
        with open(os.path.join(dead, "part=A", "data.parquet"), "w") as f:
            f.write("x")
        for p in (
            dead,
            os.path.join(dead, "part=A"),
            os.path.join(dead, "part=A", "data.parquet"),
        ):
            os.utime(p, (old, old))

        sinks.app_scratch(spark, "gc_probe")
        assert os.path.exists(live), "sibling with fresh nested write was GC'd"
        assert not os.path.exists(dead), "fully-stale sibling survived GC"
    finally:
        sinks._SCRATCH = orig
