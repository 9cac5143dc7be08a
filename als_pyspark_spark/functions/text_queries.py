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
