"""Vectorized (Arrow) pandas UDF surface — the sanctioned Python escape
hatch (SURVEY.md §2.10: the reference is row-at-a-time Python closures
everywhere; here Python appears ONLY behind Arrow batches, 10-100× the
row-at-a-time throughput).

The demo query is deliberately oracle-checkable: integer-exact per-row
stats (word count, longest token) that DuckDB computes with list
functions — proving the UDF boundary is lossless, not just plausible.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.tables import load_table

# NB: return types are DataType objects, not DDL strings — parsing a DDL
# string at decoration time needs an active SparkContext, which breaks
# importing this module (e.g. pytest collection) before a session exists.


@pandas_udf(LongType())
def word_count_udf(text: pd.Series) -> pd.Series:
    """Vectorized word count over an Arrow batch."""
    return text.str.split(" ").map(len).astype("int64")


@pandas_udf(LongType())
def longest_token_udf(text: pd.Series) -> pd.Series:
    """Length of the longest whitespace token per row."""
    return text.str.split(" ").map(lambda ts: max(len(t) for t in ts)).astype("int64")


@query(
    "q_pandas_udf_doc_stats",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       SUM(len(string_split(text, ' '))) AS total_words,
       MAX(list_max(list_transform(string_split(text, ' '), t -> len(t)))) AS max_token_len
FROM documents
GROUP BY source
""",
    tags=("udf", "pandas", "text"),
)
def q_pandas_udf_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc stats computed through Arrow-vectorized pandas UDFs,
    aggregated JVM-side. Integer-exact, so the DuckDB oracle must match —
    the UDF boundary is verified, not assumed."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        word_count_udf("text").alias("n_words"),
        longest_token_udf("text").alias("max_tok"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.max("max_tok").alias("max_token_len"),
    )
