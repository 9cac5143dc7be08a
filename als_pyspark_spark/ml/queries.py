"""Registry entries for the ALS capability.

The ratings derivation and its relational statistics get exact DuckDB
oracles; factor values are float-iterative and engine-internal, so the ALS
train/predict queries are rows-only checks (driver contract) backed by
metric-threshold tests in tests/test_als.py (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from als_pyspark_spark.ml.als import ALSEngine, ALSParams
from als_pyspark_spark.registry import query
from als_pyspark_spark.sources.ratings import RATINGS_CTE, ratings

# Small, deterministic hyperparameters for the oracle-facing queries —
# mirrors the reference demo run (rank=10, maxIter=5, regParam=0.01,
# reference ALS.py:598-599,615) but with the seed actually honored
# (the reference clobbers it, ALS.py:93 — defect D4).
_FLAGSHIP = ALSParams(rank=10, max_iter=5, reg_param=0.1, seed=42)


@query(
    "q_ratings_table",
    oracle=f"WITH ratings AS ({RATINGS_CTE}) SELECT * FROM ratings",
    tags=("ratings", "source"),
)
def q_ratings_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived ratings fixture itself (FIXTURES.md §1) — proves the
    join+distinct derivation matches the oracle bit-for-bit."""
    return ratings(spark, sf_dir)


@query(
    "q_ratings_stats",
    oracle=f"""
WITH ratings AS ({RATINGS_CTE})
SELECT COUNT(*) AS n_ratings,
       COUNT(DISTINCT user) AS n_users,
       COUNT(DISTINCT item) AS n_items,
       CAST(SUM(CAST(rating AS DECIMAL(8,1))) AS DOUBLE) / COUNT(*) AS avg_rating
FROM ratings
""",
    tags=("ratings", "agg"),
)
def q_ratings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global stats of the ratings matrix (sparsity inputs)."""
    r = ratings(spark, sf_dir)
    return r.agg(
        F.count("*").alias("n_ratings"),
        F.countDistinct("user").alias("n_users"),
        F.countDistinct("item").alias("n_items"),
        (F.sum(F.col("rating").cast("decimal(8,1)")).cast("double") / F.count("*")).alias(
            "avg_rating"
        ),
    )


@query(
    "q_most_rated_items",
    oracle=f"""
WITH ratings AS ({RATINGS_CTE})
SELECT item, COUNT(*) AS n_ratings,
       CAST(SUM(CAST(rating AS DECIMAL(8,1))) AS DOUBLE) / COUNT(*) AS avg_rating
FROM ratings
GROUP BY item
ORDER BY n_ratings DESC, item ASC
LIMIT 50
""",
    tags=("ratings", "topk"),
)
def q_most_rated_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item popularity top-50 with deterministic tie-break."""
    r = ratings(spark, sf_dir)
    return (
        r.groupBy("item")
        .agg(
            F.count("*").alias("n_ratings"),
            (F.sum(F.col("rating").cast("decimal(8,1)")).cast("double") / F.count("*")).alias(
                "avg_rating"
            ),
        )
        .orderBy(F.desc("n_ratings"), F.asc("item"))
        .limit(50)
    )


# One flagship model per (session, sf_dir): four registry queries expose
# different views of the SAME training run (factors, predictions, MSE,
# top-k), so retraining per query would quadruple gate/bench cost without
# testing anything new — determinism across runs is pinned separately by
# tests/test_als.py::test_seed_reproducibility.
_TRAINED: dict[tuple[int, str], tuple[ALSEngine, DataFrame]] = {}


def _trained(spark: SparkSession, sf_dir: str) -> tuple[ALSEngine, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _TRAINED:
        r = ratings(spark, sf_dir).cache()
        _TRAINED[key] = (ALSEngine(_FLAGSHIP).train(r), r)
    return _TRAINED[key]


@query("als_user_factors", oracle=None, tags=("als", "ml"))
def als_user_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User factor table (reference return value, ALS.py:191). Rows-only:
    one row per user, `rank` dims — asserted in tests/test_als.py."""
    eng, _ = _trained(spark, sf_dir)
    return eng.user_factors.select(
        "id", F.size("features").cast("long").alias("rank_dims")
    )


@query("als_predictions", oracle=None, tags=("als", "ml"))
def als_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score all observed pairs — the reference's only query
    (ALS.py:621-631). Rows-only; RMSE thresholds in tests."""
    eng, r = _trained(spark, sf_dir)
    return eng.predict(r)


@query("als_mse", oracle=None, tags=("als", "ml", "metric"))
def als_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training MSE as a 1-row DataFrame (reference prints it, ALS.py:630)."""
    eng, r = _trained(spark, sf_dir)
    preds = eng.predict(r)
    return preds.agg(
        F.avg(F.pow(F.col("prediction") - F.col("rating"), 2)).alias("mse"),
        F.count("*").alias("n_scored"),
    )


@query("als_top3_recs_per_user", oracle=None, tags=("als", "ml", "topk"))
def als_top3_recs_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 item recommendations per user — the capability the reference
    lacks entirely (SURVEY.md §2.6)."""
    eng, _ = _trained(spark, sf_dir)
    recs = eng.recommend_for_all_users(3)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user",
        F.col("pos").cast("long").alias("pos"),
        F.col("rec.item").alias("item"),
    )


@query("als_implicit_top3", oracle=None, tags=("als", "ml", "implicit"))
def als_implicit_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback ALS (confidence c = 1 + alpha*r) top-3 per user.

    This path is DEAD in the reference — compute_y_t_y crashes on Python
    syntax (defect D1, reference ALS.py:562-578), so implicit_prefs=True
    never ran there. Here it's MLlib's working implementation."""
    r = ratings(spark, sf_dir)
    eng = ALSEngine(
        ALSParams(rank=10, max_iter=5, reg_param=0.1, seed=42, implicit_prefs=True, alpha=10.0)
    ).train(r)
    recs = eng.recommend_for_all_users(3)
    return recs.select("user", F.posexplode("recommendations").alias("pos", "rec")).select(
        "user", F.col("pos").cast("long").alias("pos"), F.col("rec.item").alias("item")
    )


@query("als_nonnegative_factor_bounds", oracle=None, tags=("als", "ml", "nnls"))
def als_nonnegative_factor_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonnegative ALS factor bounds: with nonnegative=True every factor
    element must be >= 0 (min_factor proves it).

    Also dead in the reference — its NNLSSolver returns scipy's (x, rnorm)
    tuple instead of x (defect D3, reference Solver.py:99-101), corrupting
    every downstream factor. MLlib's projected-gradient NNLS works."""
    r = ratings(spark, sf_dir)
    eng = ALSEngine(
        ALSParams(rank=5, max_iter=5, reg_param=0.1, seed=42, nonnegative=True)
    ).train(r)
    both = eng.user_factors.unionAll(eng.item_factors)
    elem = both.select(F.explode("features").alias("f"))
    return elem.agg(
        F.min("f").cast("double").alias("min_factor"),
        F.count("*").alias("n_elements"),
    )
