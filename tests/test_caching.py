"""caching.deferred / release_deferred — the harness-checkpoint release
path for caches whose query RESULT is corpus-proportional (collected()
would bottleneck the driver) but that have no cross-query readers
(round-11 ADVICE: the decontaminate gram table leaked for the session
lifetime)."""

from __future__ import annotations

from pyspark import StorageLevel

from als_pyspark_spark import caching
from als_pyspark_spark.caching import deferred, release_deferred


def _is_cached(df) -> bool:
    return df.storageLevel != StorageLevel(False, False, False, False, 1)


def test_deferred_releases_at_checkpoint(spark):
    df = deferred(spark.range(10).persist())
    assert _is_cached(df)
    assert df.count() == 10
    assert release_deferred() == 1
    assert not _is_cached(df)
    # registry drained: a second checkpoint is a no-op
    assert release_deferred() == 0


def test_deferred_returns_the_same_frame_and_stacks(spark):
    a = spark.range(3).persist()
    b = spark.range(4).persist()
    assert deferred(a) is a
    assert deferred(b) is b
    assert release_deferred() == 2
    assert not _is_cached(a) and not _is_cached(b)
    assert not caching._DEFERRED


def test_q_decontaminate_cache_is_released_by_checkpoint(spark, sf_dir):
    """The ADVICE site end-to-end: running the query registers exactly one
    deferred cache, and the harness checkpoint releases it (the harnesses —
    check_correctness, bench, the pytest mirror — all call it per query)."""
    from als_pyspark_spark.functions.pipeline_queries import q_decontaminate

    release_deferred()  # clean slate
    result = q_decontaminate(spark, sf_dir)
    result.collect()
    assert len(caching._DEFERRED) == 1
    gram_cache = caching._DEFERRED[0]
    assert _is_cached(gram_cache)
    assert release_deferred() == 1
    assert not _is_cached(gram_cache)
