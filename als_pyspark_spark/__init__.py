"""als_pyspark_spark — a Spark-native analytics engine with the capabilities of
leonlyu1996/als-pyspark (reference: /root/reference, surveyed in SURVEY.md).

The reference is an RDD-level re-implementation of blocked ALS
(reference ALS.py:24-191). This engine re-expresses every capability
Spark-first:

- data model      -> DataFrame/SQL over parquet (sources/)
- ALS training    -> pyspark.ml.recommendation.ALS (ml/als.py)
- relational ops  -> Catalyst-planned DataFrame queries (operators/)
- extensions      -> dedup / similarity search / text analysis /
                     multimodal plumbing / streaming (dedup/, similarity/,
                     functions/, multimodal/, streaming/)

Everything user-facing is registered in the query registry
(``als_pyspark_spark.registry``) so the driver contract
(``__spark_entry__.py``) and the test-suite consume one source of truth.
"""

__version__ = "0.1.0"

from als_pyspark_spark.session import build_session  # noqa: F401
from als_pyspark_spark.registry import QUERIES, Query, query  # noqa: F401
