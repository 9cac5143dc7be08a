"""Text-analysis column builders (all JVM-side built-ins — no Python UDFs).

These are the composable pieces behind the text-analysis and dedup queries:
tokenization, word n-gram shingles, stopword/quality metrics, language-ID
heuristic, document fingerprinting. Everything is a per-row expression
(transform/aggregate/filter higher-order functions), so the operators add
ZERO shuffles and stay inside WholeStageCodegen — the property that matters
at 100 TB, where an explode-based shingle pipeline would multiply the scan
volume by ~token-count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic tiny stopword list shared with the DuckDB oracles.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents.text is single-space separated)."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles as strings, e.g. 'spark join order' for n=3.

    Built as a zip_with chain of shifted slices: gram_i = t_i ++ t_{i+1} ++
    … ++ t_{i+n-1} accumulates by zipping the running prefix with the next
    1-shifted slice. Each slice references ``toks`` at ROW scope, so the
    whole expression evaluates the ``toks`` subtree O(n) times per row.

    The obvious alternative — transform over sequence(1, count) with
    element_at(toks, i+j) lookups — re-evaluates the ``toks`` subtree inside
    the per-ELEMENT lambda: O(grams·n) evaluations per row. Callers pass
    ``split(text)`` expressions directly (and CollapseProject inlines them
    even when they don't), so that form re-split every document ~n·grams
    times — measured 7× slower on the 5-gram decontamination pipeline.

    zip_with pads the shorter (shifted) side with null and concat_ws skips
    nulls, so tail positions hold partial grams — the final slice to
    count = size-(n-1) drops them. Empty array when the doc has fewer than
    n tokens.

    PRECONDITION: ``toks`` must contain no null ELEMENTS. The same
    concat_ws null-skip that drops padded tail slots would silently merge
    a mid-array null into a shortened (n-1)-gram instead of surfacing the
    bad token. Every in-repo caller passes ``tokens()``/``split()`` output,
    which never yields null elements; wrap arbitrary nullable arrays with
    ``transform(toks, t -> coalesce(t, ''))`` (or filter) before calling.
    """
    count = F.size(toks) - (n - 1)
    z = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        z = F.zip_with(z, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(count >= 1, F.slice(z, 1, count)).otherwise(
        F.array().cast("array<string>")
    )


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")


def stopword_ratio(toks: Column) -> Column:
    return stopword_count(toks) / F.size(toks)


def mean_token_len(toks: Column) -> Column:
    """Average token length in chars — F.aggregate running sum (the
    DataFrame twin of the reference's per-partition accumulate, P3)."""
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def lang_id(toks: Column) -> Column:
    """N-gram-free heuristic language ID: stopword-profile vote.

    Real pipelines use char-n-gram profiles per language; the test corpus is
    synthetic English-like text, so the heuristic is: high English-stopword
    ratio => 'en', some evidence => 'en-ish', else 'unknown'. Deterministic
    CASE expression — identical in the DuckDB oracle.
    """
    r = stopword_ratio(toks)
    return (
        F.when(r >= 0.10, F.lit("en"))
        .when(r >= 0.03, F.lit("en-ish"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(text: Column | str, toks: Column) -> Column:
    """Composite quality score in [0,1]: length band + stopword band +
    mean-token-length band. Deterministic integer-ish arithmetic (double
    ops on small exact values), mirrored 1:1 in the oracle SQL."""
    n_toks = F.size(toks)
    len_ok = F.when((n_toks >= 20) & (n_toks <= 400), 0.4).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(toks) >= 0.02, 0.3).otherwise(0.0)
    mtl = mean_token_len(toks)
    mtl_ok = F.when((mtl >= 3.0) & (mtl <= 8.0), 0.3).otherwise(0.0)
    return (len_ok + stop_ok + mtl_ok).cast("double")


def fingerprint(toks: Column, n: int = 3) -> Column:
    """Winnowing-style document fingerprint: lexicographic MIN of the md5
    of each word-n-gram. Content-defined (robust to reordering of doc ids),
    exact-matchable in DuckDB (same md5, same min semantics)."""
    grams = word_ngrams(toks, n)
    return F.when(
        F.size(grams) > 0, F.array_min(F.transform(grams, F.md5))
    ).otherwise(F.md5(F.concat_ws(" ", toks)))
