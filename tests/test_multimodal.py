"""Multimodal plumbing: binary round-trip, mapInPandas batch shape, stub
boundary."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from als_pyspark_spark.multimodal.binary import (
    decode_image,
    extract_features,
    with_binary_payload,
)
from als_pyspark_spark.sources.tables import load_table


def test_payload_schema(spark, sf_dir):
    mm = with_binary_payload(load_table(spark, sf_dir, "documents"))
    schema = {f.name: f.dataType.simpleString() for f in mm.schema.fields}
    assert schema["payload"] == "binary"
    assert schema["meta"] == "struct<format:string,n_bytes:bigint>"


def test_features_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    feats = extract_features(with_binary_payload(d)).collect()
    docs = {r.doc_id: r.text for r in d.collect()}
    assert len(feats) == 50
    for r in feats:
        text = docs[r.doc_id]
        assert r.n_bytes == len(text.encode())
        assert r.head_hash == hashlib.md5(text.encode()[:16]).hexdigest()
        assert 0.0 <= r.fake_mean_luma <= 1.0


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_metadata_only_query_prunes_payload(spark, sf_dir):
    mm = with_binary_payload(load_table(spark, sf_dir, "documents"))
    meta_only = mm.select("doc_id", F.col("meta.n_bytes"))
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
