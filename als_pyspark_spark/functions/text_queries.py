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
