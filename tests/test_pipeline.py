"""Semantic properties of the training-data pipeline operators (the oracle
gate proves Spark≡DuckDB; these prove the operators mean what they claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from als_pyspark_spark.plans.inspect import plan_of
from als_pyspark_spark.registry import load_all_queries

QUERIES = load_all_queries()


def test_split_is_deterministic_and_near_80_20(spark, sf_dir):
    df = QUERIES["q_split_train_test"].build(spark, sf_dir)
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert 0.70 <= counts["train"] / total <= 0.90, counts
    # deterministic: re-running yields the identical assignment
    again = QUERIES["q_split_train_test"].build(spark, sf_dir)
    assert df.exceptAll(again).count() == 0 and again.exceptAll(df).count() == 0


def test_split_adds_no_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["q_split_train_test"].build(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_stratified_sample_exact_fraction_per_stratum(spark, sf_dir):
    strata = {
        r.source: r.n
        for r in QUERIES["q_sample_stratified"]
        .build(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    from als_pyspark_spark.sources.tables import load_table

    full = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    import math

    for s, n in full.items():
        assert strata.get(s) == math.ceil(n * 0.1), (s, n, strata.get(s))


def test_balanced_sample_exactly_k_per_source(spark, sf_dir):
    counts = [
        r.n
        for r in QUERIES["q_sample_balanced"]
        .build(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert counts and all(n == 10 for n in counts), counts


def test_shuffle_order_is_permutation(spark, sf_dir):
    df = QUERIES["q_shuffle_order"].build(spark, sf_dir)
    n = df.count()
    stats = df.agg(
        F.countDistinct("shuffle_pos").alias("d"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
    ).collect()[0]
    assert (stats.d, stats.lo, stats.hi) == (n, 1, n)


def test_decontaminate_flags_exact_duplicates_of_benchmark(spark, sf_dir):
    # any non-benchmark doc whose text equals a benchmark doc's text MUST be
    # flagged (identical text ⇒ identical 5-gram set)
    from als_pyspark_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bench = d.where((F.col("doc_id") % 97 == 0) & (F.size(F.split("text", " ")) >= 5))
    dup_of_bench = (
        d.where(F.col("doc_id") % 97 != 0)
        .alias("t")
        .join(bench.alias("b"), F.col("t.text") == F.col("b.text"))
        .select(F.col("t.doc_id").alias("doc_id"))
        .distinct()
    )
    expected = {r.doc_id for r in dup_of_bench.collect()}
    flagged = {
        r.doc_id for r in QUERIES["q_decontaminate"].build(spark, sf_dir).collect()
    }
    assert expected <= flagged, expected - flagged


def test_normalize_is_idempotent(spark, sf_dir):
    df = QUERIES["q_text_normalize"].build(spark, sf_dir)
    renorm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("norm_text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    assert df.where(F.col("norm_text") != renorm).count() == 0


def test_pii_redact_kills_emails_and_long_digit_runs(spark):
    row = (
        spark.createDataFrame(
            [(1, "mail bob.smith+x@corp.example.com card 1234567890 ok 123")],
            "doc_id long, text string",
        )
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("text"),
                    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                    "<EMAIL>",
                ),
                "[0-9]{6,}",
                "<NUM>",
            ).alias("r")
        )
        .collect()[0]
    )
    assert row.r == "mail <EMAIL> card <NUM> ok 123"


def test_vocab_ids_are_dense_and_frequency_ordered(spark, sf_dir):
    rows = QUERIES["q_vocab_top"].build(spark, sf_dir).collect()
    ids = [r.vocab_id for r in rows]
    assert ids == list(range(1, len(rows) + 1))
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_length_filter_drops_both_tails(spark, sf_dir):
    from als_pyspark_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    total = d.count()
    kept = QUERIES["q_length_filter_percentile"].build(spark, sf_dir)
    n_kept = kept.count()
    assert n_kept < total  # something was dropped
    assert n_kept >= 0.85 * total  # but no more than ~the two 5% tails
    lo_all = d.agg(F.min("n_chars")).collect()[0][0]
    lo_kept = kept.agg(F.min("n_chars")).collect()[0][0]
    assert lo_kept > lo_all  # the short tail is gone


def test_chunking_covers_every_token_with_stride_overlap(spark, sf_dir):
    from als_pyspark_spark.functions.pipeline_queries import _CHUNK, _STRIDE
    from als_pyspark_spark.sources.tables import load_table

    chunks = QUERIES["q_chunk_documents"].build(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("m")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max("n_tokens").alias("max_len"),
        F.sum("n_tokens").alias("tok_sum"),
    )
    j = per_doc.join(docs, "doc_id")
    # every chunk bounded by the chunk size
    assert j.where(F.col("max_len") > _CHUNK).count() == 0
    # coverage: last chunk ends at the last token -> total emitted tokens =
    # m + overlap*(n_chunks-1) only when chunks are full; weaker invariant
    # that holds always: (n_chunks-1)*stride < m <= (n_chunks-1)*stride + chunk
    bad = j.where(
        ~(
            ((F.col("n_chunks") - 1) * _STRIDE < F.col("m"))
            & (F.col("m") <= (F.col("n_chunks") - 1) * _STRIDE + _CHUNK)
        )
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_packing_offsets_are_contiguous_per_shard(spark, sf_dir):
    from als_pyspark_spark.sources.tables import load_table

    packed = QUERIES["q_pack_sequences"].build(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    j = packed.join(docs, "doc_id")
    # per shard: offsets start at 0 and the stream has no holes — the max
    # (start_offset + n_tok) equals the shard's total token count
    agg = j.groupBy("shard").agg(
        F.min("start_offset").alias("lo"),
        F.max(F.col("start_offset") + F.col("n_tok")).alias("end"),
        F.sum("n_tok").alias("tot"),
    )
    assert agg.where(F.col("lo") != 0).count() == 0
    assert agg.where(F.col("end") != F.col("tot")).count() == 0
    # bin ids are non-negative and docs assigned to the bin they start in
    from als_pyspark_spark.functions.pipeline_queries import _PACK_BUDGET

    bad = packed.where(
        (F.col("bin_id") < 0)
        | (F.col("start_offset") - F.col("bin_id") * _PACK_BUDGET < 0)
        | (F.col("start_offset") - F.col("bin_id") * _PACK_BUDGET >= _PACK_BUDGET)
    )
    assert bad.count() == 0


def test_approx_topk_matches_exact_topk(spark, sf_dir):
    """At fixture scale the frequent-items sketch tracks more slots than
    distinct tokens, so its top-20 must agree with the exact aggregate:
    identical count multiset (tie-safe — equal-count items may order
    differently) and exact_match witnessed on every row."""
    from collections import Counter

    from pyspark.sql import functions as F

    from als_pyspark_spark.registry import load_all_queries
    from als_pyspark_spark.functions.text import tokens
    from als_pyspark_spark.sources.tables import load_table

    q = load_all_queries()["q_approx_topk_tokens"]
    rows = q.build(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.exact_match for r in rows)

    d = load_table(spark, sf_dir, "documents")
    exact = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .count()
        .orderBy(F.desc("count"), F.asc("tok"))
        .limit(20)
        .collect()
    )
    assert Counter(r.approx_count for r in rows) == Counter(r["count"] for r in exact)


def test_quality_scorer_sign_consistency_and_determinism(spark, sf_dir):
    """The verdict must be exactly the sign test on the integer score, and
    two independent builds must agree bit-for-bit (the broadcast weight
    vector is a seeded literal — nothing nondeterministic in the plan)."""
    from als_pyspark_spark.registry import load_all_queries

    q = load_all_queries()["q_quality_linear_scorer"]
    rows = sorted((r.doc_id, r.qscore, r.verdict) for r in q.build(spark, sf_dir).collect())
    assert rows
    for _, qscore, verdict in rows:
        assert verdict == ("keep" if qscore > 0 else "drop")
    again = sorted((r.doc_id, r.qscore, r.verdict) for r in q.build(spark, sf_dir).collect())
    assert rows == again


def test_quality_scorer_single_token_matches_weight(spark, tmp_path):
    """A one-token document's score IS that token's bucket weight — pins
    the md5→bucket→element_at indexing against an independent Python
    recomputation of the same arithmetic."""
    import hashlib

    from als_pyspark_spark.functions.pipeline_queries import (
        _QS_BUCKETS,
        _qs_weights,
    )
    from als_pyspark_spark.registry import load_all_queries

    tok = "spark"
    spark.createDataFrame(
        [(7, tok, "en", "s", len(tok))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    h60 = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
    expect = _qs_weights()[h60 % _QS_BUCKETS]
    [row] = (
        load_all_queries()["q_quality_linear_scorer"]
        .build(spark, str(tmp_path))
        .collect()
    )
    assert row.qscore == expect


def test_cogroup_asof_matches_relational_form(spark, sf_dir):
    """The cogrouped merge_asof surface proof must return EXACTLY the
    relational range-join+argmax composition's rows — same oracle, same
    semantics, different execution surface."""
    from als_pyspark_spark.registry import load_all_queries

    q = load_all_queries()
    a = sorted(
        (r.event_id, r.last_orderdate)
        for r in q["q_cogroup_asof_merge"].build(spark, sf_dir).collect()
    )
    b = sorted(
        (r.event_id, r.last_orderdate)
        for r in q["q_asof_last_order_before_event"].build(spark, sf_dir).collect()
    )
    assert a == b
    assert a  # non-trivial at every SF


def test_arrow_map_matches_jvm_builtins(spark, sf_dir):
    """mapInArrow token/char stats must equal the JVM built-in forms row
    for row (split-size and length), including any empty-text rows."""
    from pyspark.sql import functions as F

    from als_pyspark_spark.registry import load_all_queries
    from als_pyspark_spark.sources.tables import load_table

    got = {
        r.doc_id: (r.n_tokens, r.n_chars)
        for r in load_all_queries()["q_arrow_map_token_stats"]
        .build(spark, sf_dir)
        .collect()
    }
    want = {
        r.doc_id: (r.nt, r.nc)
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("nt"),
            F.length("text").cast("long").alias("nc"),
        )
        .collect()
    }
    assert got == want


def test_weighted_reservoir_python_replay(spark, tmp_path):
    """The A-ES sample must equal a pure-Python replay of the same
    max-of-w md5 keys (exactness), return exactly min(10, group size)
    rows per source, and respect the rank order the keys induce."""
    import hashlib

    from als_pyspark_spark.registry import load_all_queries

    rows = []
    did = 0
    for src, n_docs in (("wiki", 25), ("web", 7), ("code", 12)):
        for _ in range(n_docs):
            # vary token counts so weights span 1..8
            text = " ".join(f"t{did}_{j}" for j in range((did % 10) * 16 + 1))
            rows.append((did, text, "en", src, len(text)))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = [
        (r.source, r.smp_rank, r.doc_id, r.weight, r.sample_key)
        for r in load_all_queries()["q_sample_weighted_reservoir"]
        .build(spark, str(tmp_path))
        .collect()
    ]

    def key(doc_id, w):
        return max(
            int(hashlib.md5(f"wres|{doc_id}|{j}".encode()).hexdigest()[:15], 16)
            for j in range(1, w + 1)
        )

    want = []
    by_src: dict[str, list] = {}
    for doc_id, text, _, src, _ in rows:
        w = min(8, 1 + len(text.split(" ")) // 16)
        by_src.setdefault(src, []).append((-key(doc_id, w), doc_id, w))
    for src in by_src:
        for rank, (negk, doc_id, w) in enumerate(sorted(by_src[src])[:10], 1):
            want.append((src, rank, doc_id, w, -negk))
    assert sorted(got) == sorted(want)
    from collections import Counter

    per_src = Counter(s for s, *_ in got)
    assert per_src == {"wiki": 10, "web": 7, "code": 10}


def test_consistent_shard_minimal_movement(spark, sf_dir):
    """The resize witness: adding a 9th shard moves docs ONLY to the new
    shard (n_reassigned_existing must be 0 in every row), the moved
    fraction is in a sane band around 1/9, and every original shard is
    populated. Assignment is also replayed in pure Python for one ring."""
    import hashlib

    from als_pyspark_spark.functions.pipeline_queries import _ring
    from als_pyspark_spark.registry import load_all_queries
    from als_pyspark_spark.sources.tables import load_table

    rows = (
        load_all_queries()["q_consistent_shard_assignment"]
        .build(spark, sf_dir)
        .collect()
    )
    assert len(rows) == 8
    assert all(r.n_reassigned_existing == 0 for r in rows)
    n = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved_to_new for r in rows)
    assert 0 < moved < n / 3  # ~1/9 expected; wide band, never a rehash

    # python replay of the before-ring for a handful of docs
    ring = _ring(8)
    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").limit(20).collect()
    ]
    by_shard = {r.shard: r.n_docs for r in rows}
    for doc_id in ids:
        h16 = int(hashlib.md5(f"doc|{doc_id}".encode()).hexdigest()[:11], 16) * 16
        succ = min((p for p in ring if p >= h16), default=min(ring))
        assert (succ % 16) in by_shard


def test_contrastive_pairs_construction_invariants(spark, sf_dir):
    """Structural invariants of the mined training pairs: positives are
    genuine near-dups (0.5 <= J < 1), negatives never equal the anchor or
    positive and never form a known near-dup pair with the anchor, and
    each (anchor, positive) contributes at most 2 negatives."""
    from collections import Counter

    from als_pyspark_spark.registry import load_all_queries

    q = load_all_queries()
    rows = q["q_contrastive_pairs"].build(spark, sf_dir).collect()
    assert rows
    dup_pairs = {
        (r.doc_a, r.doc_b)
        for r in q["q_dedup_minhash_lsh"].build(spark, sf_dir).collect()
    }
    per_pair = Counter((r.anchor, r.positive) for r in rows)
    for r in rows:
        assert 0.5 <= r.jaccard < 1.0
        assert r.negative not in (r.anchor, r.positive)
        key = (min(r.anchor, r.negative), max(r.anchor, r.negative))
        assert key not in dup_pairs
        assert (r.anchor, r.positive) in dup_pairs
    assert all(v <= 2 for v in per_pair.values())
