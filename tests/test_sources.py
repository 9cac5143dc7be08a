

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
