"""Text-analysis queries over documents (language-ID, quality scoring,
token counting, fingerprinting) — registry entries with DuckDB oracles.

All metrics are per-row JVM expressions from functions/text.py; the only
shuffles are the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.functions.text import (
    STOPWORDS,
    fingerprint,
    lang_id,
    mean_token_len,
    quality_score,
    stopword_count,
    token_count,
    tokens,
)
from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q_text_token_counts",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       n_chars
FROM documents
""",
    tags=("text", "tokens"),
)
def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count per document."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", token_count(F.col("text")).alias("n_tokens"), "n_chars")


@query(
    "q_text_quality",
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n_toks
    FROM documents
), m AS (
    SELECT doc_id, n_toks,
           CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS BIGINT) AS n_stop,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE) / n_toks AS mean_tok_len
    FROM t
)
SELECT doc_id, n_stop,
       CAST(n_stop AS DOUBLE) / n_toks AS stop_ratio,
       mean_tok_len,
       CAST(
         (CASE WHEN n_toks BETWEEN 20 AND 400 THEN 0.4 ELSE 0.0 END)
       + (CASE WHEN CAST(n_stop AS DOUBLE) / n_toks >= 0.02 THEN 0.3 ELSE 0.0 END)
       + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 8.0 THEN 0.3 ELSE 0.0 END)
       AS DOUBLE) AS quality
FROM m
""",
    tags=("text", "quality"),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + mean token length + length band."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        stopword_count(toks).alias("n_stop"),
        (stopword_count(toks).cast("double") / F.size(toks)).alias("stop_ratio"),
        mean_token_len(toks).alias("mean_tok_len"),
        quality_score(F.col("text"), toks).alias("quality"),
    )


@query(
    "q_text_lang_id",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang,
           CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS DOUBLE)
             / len(string_split(text, ' ')) AS r
    FROM documents
)
SELECT CASE WHEN r >= 0.10 THEN 'en'
            WHEN r >= 0.03 THEN 'en-ish'
            ELSE 'unknown' END AS pred_lang,
       COUNT(*) AS n_docs
FROM t
GROUP BY 1
""",
    tags=("text", "langid"),
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID, aggregated by predicted language."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(lang_id(tokens(F.col("text"))).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "q_text_fingerprints",
    oracle="""
WITH t AS (
    SELECT doc_id,
           text,
           string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n
    FROM documents
)
SELECT doc_id,
       CASE WHEN n >= 3
            THEN list_min(list_transform(
                 list_transform(generate_series(1, n - 2),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
                 g -> MD5(g)))
            ELSE MD5(text)
       END AS fp
FROM t
""",
    tags=("text", "fingerprint"),
)
def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-md5 3-gram fingerprint per document."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(tokens(F.col("text")), 3).alias("fp"))


@query(
    "q_text_top_tokens",
    oracle="""
SELECT tok, COUNT(*) AS n
FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT 30
""",
    tags=("text", "explode", "topk"),
)
def q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-30 (explode → agg → top-k).

    The one text query that deliberately uses explode (reference P4
    flatMap analogue, ALS.py:536): token-level aggregation needs row
    multiplication. Partial aggregation tames the shuffle at scale.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(30)
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, or single other
# non-space char — the word/number/punct split every BPE pipeline applies
# before merges. Plain character classes only, so Java regex (Spark) and
# RE2 (DuckDB) agree exactly.
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "q_text_bpe_token_counts",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
FROM documents
""",
    tags=("text", "tokens", "bpe"),
)
def q_text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization count beside the whitespace count — the
    token-budget estimator of a training-data pipeline (pre-merge BPE
    piece count upper-bounds the post-merge count)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
        token_count(F.col("text")).alias("n_ws_tokens"),
    )


_BM25_TERMS = ("join", "scan", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


@query(
    "q_bm25_retrieval",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
m AS (
    SELECT doc_id,
           len(toks) AS dl,
           len(list_filter(toks, x -> x = '{_BM25_TERMS[0]}')) AS tf1,
           len(list_filter(toks, x -> x = '{_BM25_TERMS[1]}')) AS tf2,
           len(list_filter(toks, x -> x = '{_BM25_TERMS[2]}')) AS tf3
    FROM t
),
s AS (
    SELECT COUNT(*) AS n,
           SUM(dl) AS tot,
           COUNT(*) FILTER (WHERE tf1 > 0) AS df1,
           COUNT(*) FILTER (WHERE tf2 > 0) AS df2,
           COUNT(*) FILTER (WHERE tf3 > 0) AS df3
    FROM m
),
scored AS (
    SELECT doc_id,
           ((n - df1 + 0.5) / (df1 + 0.5)) * ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + (0.75 * dl) / (tot / n))))
         + ((n - df2 + 0.5) / (df2 + 0.5)) * ((tf2 * 2.2) / (tf2 + 1.2 * (0.25 + (0.75 * dl) / (tot / n))))
         + ((n - df3 + 0.5) / (df3 + 0.5)) * ((tf3 * 2.2) / (tf3 + 1.2 * (0.25 + (0.75 * dl) / (tot / n))))
           AS score
    FROM m, s
)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id ASC LIMIT {_BM25_TOPK}
""",
    tags=("text", "retrieval", "bm25"),
)
def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed 3-term query — the retrieval
    scorer a corpus-curation pipeline uses for quality probes and nearest-
    benchmark lookups.

    Float-exact across engines BY CONSTRUCTION: the idf factor is the raw
    ratio (N - df + 0.5)/(df + 0.5) rather than its logarithm (ln is not
    correctly-rounded and differs between libm implementations; +, *, /
    are IEEE-exact), term contributions are summed in fixed left-to-right
    term order, and tf/df/dl/N are integers — so Spark and the oracle
    compute bit-identical doubles. The ratio idf is monotone in the
    standard log idf, so the ranking is the textbook BM25 ranking.

    Scale shape: corpus stats (N, Σdl, per-term df) are ONE aggregate
    broadcast back; per-doc scoring is a row-local expression; top-k is
    TakeOrderedAndProject. No shuffle of the corpus at any point.
    """
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    def tf_of(term: str) -> F.Column:
        # single-arg lambda: a 2-arg signature would be read as the
        # (element, index) filter variant
        return F.size(F.filter("toks", lambda x: x == F.lit(term)))

    m = toked.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[tf_of(t).alias(f"tf{i+1}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = m.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("tot"),
        *[
            F.count_if(F.col(f"tf{i+1}") > 0).alias(f"df{i+1}")
            for i in range(len(_BM25_TERMS))
        ],
    )

    def contrib(i: int) -> F.Column:
        tf = F.col(f"tf{i}")
        df = F.col(f"df{i}")
        idf = (F.col("n") - df + F.lit(0.5)) / (df + F.lit(0.5))
        den = tf + F.lit(_BM25_K1) * (
            F.lit(0.25) + (F.lit(_BM25_B) * F.col("dl")) / (F.col("tot") / F.col("n"))
        )
        return idf * ((tf * F.lit(_BM25_K1 + 1)) / den)

    score = contrib(1) + contrib(2) + contrib(3)
    return (
        m.crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


@query(
    "q_approx_topk_tokens",
    oracle=None,  # frequent-items sketch output is engine-specific
    tags=("text", "sketch", "approx", "topk"),
)
def q_approx_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via approx_top_k (Spark 4's frequent-items sketch):
    corpus-wide top-20 tokens from ONE aggregation whose state is a
    bounded sketch (maxItemsTracked counters), not the full token
    dictionary — the 100 TB path when the distinct-token space (think
    URLs, n-grams, user ids) no longer fits a hash aggregate. Rows-only
    by design, but each ROW witnesses the result quality: every sketch
    item carries its exact count from a side-by-side exact aggregate and
    an exact_match flag (count agreement) — on fixture corpora the
    tracked space exceeds the distinct-token count, so the sketch is
    lossless and every row must witness exact_match = true; at real
    scale the flag is what an offline audit would sample.

    Tie handling: ranks can differ between the sketch's internal order
    and the exact ordering for equal counts, so the output pins
    (token, count) pairs, not ranks."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    sketch = toks.agg(
        F.expr("approx_top_k(tok, 20, 100000)").alias("tk")
    ).select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("token"),
        F.col("e.count").alias("approx_count"),
    )
    exact = toks.groupBy(F.col("tok").alias("token")).agg(
        F.count("*").alias("exact_count")
    )
    # Scale shape: semi-filter the (huge at scale) exact aggregate down to
    # the 20 sketch tokens first — a broadcast left-semi with the sketch as
    # build side — so the outer witness join is tiny × tiny. A direct
    # sketch-LEFT-JOIN-exact would have to broadcast or shuffle the full
    # token dictionary.
    exact_hits = exact.join(F.broadcast(sketch.select("token")), "token", "leftsemi")
    return sketch.join(F.broadcast(exact_hits), "token", "left").select(
        "token",
        "approx_count",
        "exact_count",
        (F.col("approx_count") == F.col("exact_count")).alias("exact_match"),
    )


@query(
    "q_bpe_pair_counts",
    oracle="""
WITH words AS (
    SELECT tok, COUNT(*) AS wc
    FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
    WHERE len(tok) >= 2
    GROUP BY tok
), pairs AS (
    SELECT UNNEST(list_transform(generate_series(1, len(tok) - 1),
                                 i -> substr(tok, i, 2))) AS pair,
           wc
    FROM words
)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 30
""",
    tags=("text", "bpe", "tokenizer"),
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round: count adjacent character pairs across the
    corpus, weighted by word frequency — the argmax of this table IS the
    first merge a BPE tokenizer trainer would learn. Complements
    ``q_text_bpe_token_counts`` (which counts pre-tokenized pieces) with
    the actual merge-statistics computation.

    The corpus collapses to the word-frequency table FIRST (the standard
    BPE-training trick: pair counts are ``Σ wc(word) · pairs(word)``, so
    the expensive explode runs over distinct words, not over every token
    occurrence), then each word explodes into its ``len-1`` overlapping
    2-grams via sequence+substr — all JVM-side HOFs, no UDFs. Single-char
    words are filtered symmetrically on both engines (they contribute no
    pairs; the filter also keeps Spark's ``sequence(1, 0)`` from emitting
    its descending-step artifact).

    100 TB shape: the word rollup is the only corpus-sized shuffle
    (partial aggregation absorbs within-doc repetition); the pair explode
    runs over the (vastly smaller, Zipf-truncated) distinct-word table and
    its rollup is dictionary-sized; top-30 is TakeOrdered.
    """
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count("*").alias("wc"))
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.substring(F.col("tok"), i, F.lit(2)),
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(30)
    )


@query(
    "q_bigram_lm_counts",
    oracle="""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), bigrams AS (
    SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1])) AS bigram
    FROM toks WHERE len(t) >= 2
), unigrams AS (
    SELECT UNNEST(t) AS w1 FROM toks
), bg AS (
    SELECT string_split(bigram, ' ')[1] AS w1,
           string_split(bigram, ' ')[2] AS w2,
           COUNT(*) AS cond_num
    FROM bigrams GROUP BY 1, 2
), ug AS (
    SELECT w1, COUNT(*) AS w1_count FROM unigrams GROUP BY w1
)
SELECT bg.w1, bg.w2,
       CAST(bg.cond_num AS BIGINT) AS cond_num,
       CAST(ug.w1_count AS BIGINT) AS cond_den
FROM bg JOIN ug USING (w1)
ORDER BY cond_num DESC, w1, w2
LIMIT 30
""",
    tags=("text", "ngram-lm", "tokenizer"),
)
def q_bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model estimation counts: for the corpus's top
    bigrams, the maximum-likelihood conditional ``P(w2|w1)`` as the exact
    integer fraction ``count(w1 w2) / count(w1)`` — the statistics an
    n-gram LM (or a data-quality perplexity filter) is built from, with
    no division and therefore no float drift. Complements
    q_bpe_pair_counts (character level) and q_text_top_tokens (unigram
    level) at the token-bigram level.

    Bigrams explode via the same sequence+zip idiom as the shingling
    queries (JVM HOFs, single-char-free since documents are
    space-tokenized); the conditional denominator joins from the unigram
    rollup on w1.

    100 TB shape: two partial+final aggregates (bigram, unigram) — the
    unigram table is vocabulary-sized, so the denominator join
    broadcasts; top-30 is TakeOrdered. Zipf head skew on w1 is absorbed
    by map-side partial aggregation before the shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(tokens(F.col("text")).alias("t"))
    bigrams = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cond_num"))
    )
    unigrams = (
        toks.select(F.explode("t").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("w1_count"))
    )
    return (
        bigrams.join(F.broadcast(unigrams), "w1")
        .select("w1", "w2", "cond_num", F.col("w1_count").alias("cond_den"))
        .orderBy(F.desc("cond_num"), F.asc("w1"), F.asc("w2"))
        .limit(30)
    )


@query(
    "q_source_vocab_overlap",
    oracle="""
WITH vocab AS (
    SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS tok
    FROM documents
), sizes AS (
    SELECT source, COUNT(*) AS n FROM vocab GROUP BY source
), inter AS (
    SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
    FROM vocab a JOIN vocab b
      ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
)
SELECT i.source_a, i.source_b,
       CAST(sa.n AS BIGINT) AS vocab_a,
       CAST(sb.n AS BIGINT) AS vocab_b,
       CAST(i.n_common AS BIGINT) AS n_common,
       CAST((i.n_common * 1000000) // (sa.n + sb.n - i.n_common) AS BIGINT)
           AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
""",
    tags=("text", "corpus-similarity", "jaccard"),
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level source similarity: pairwise vocabulary Jaccard
    between sources (in exact ppm via integer cross-division) — the
    dataset-comparison readout behind mixture design and contamination
    triage (two sources with near-identical vocabularies are candidates
    for dedup ahead of mixing; q_mixture_rebalance decides the weights,
    this measures the redundancy).

    100 TB shape: the corpus collapses to the DISTINCT (source, token)
    vocabulary first — vocabulary-sized, Zipf-truncated — so the pair
    join runs over dictionaries, not documents; with |sources| small the
    intersect join is dictionary × dictionary on the token key. The same
    computation over MinHash signatures (q_dedup_minhash_lsh's family)
    replaces the exact intersect when vocabularies stop fitting."""
    d = load_table(spark, sf_dir, "documents")
    vocab = d.select("source", F.explode(tokens(F.col("text"))).alias("tok")).distinct()
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            F.expr(
                "(n_common * 1000000) DIV (vocab_a + vocab_b - n_common)"
            ).alias("jaccard_ppm"),
        )
    )
