"""Medallion (silver/gold) transform operators (SURVEY §7.1 item 5).

The reference's silver layer (notebooks/05.movielens/02.movielens-silver.py)
cleans bronze into conformed tables: snake_case renames, title/year parsing,
genre splitting, epoch→timestamp, rescued-row checks. Its gold layer
(03.movielens-gold.py) trains an ALS recommender and materializes
recommendation tables.

Silver ops here are **built-in column expressions** (X3 style) — the
reference's `parse_title` Python UDF (X1, 02.movielens-silver.py:121-139) is
kept only as a parity reference implementation; the engine path is the
regexp version (JVM-side, ~100x less per-row overhead at scale). A pytest
asserts both agree.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

TITLE_YEAR_RE = r"^(.*?)\s*\((\d{4})\)\s*$"


def parse_title(col: Column | str) -> Column:
    """X3 builtin-composition: "Toy Story (1995)" → struct(title, year).
    Engine path for the reference's parse_title UDF."""
    c = F.col(col) if isinstance(col, str) else col
    title = F.regexp_extract(c, TITLE_YEAR_RE, 1)
    year = F.regexp_extract(c, TITLE_YEAR_RE, 2)
    return F.struct(
        F.when(title != "", title).otherwise(F.trim(c)).alias("title"),
        F.when(year != "", year.cast("int")).alias("year"),
    )


@F.udf(ArrayType(StringType()))
def parse_title_udf(raw: str) -> list[str] | None:
    """X1 parity reference: the reference's row-at-a-time Python UDF
    (05.movielens/02.movielens-silver.py:121-139). Kept for parity testing
    only — never used in engine paths (UDFs are the slow path)."""
    if raw is None:
        return None
    m = re.match(TITLE_YEAR_RE, raw)
    if m:
        return [m.group(1), m.group(2)]
    return [raw.strip(), None]


def split_multivalue(col: Column | str, sep: str = r"\|",
                     drop: tuple[str, ...] = ("(no genres listed)",)) -> Column:
    """genres 'A|B|C' → array, with sentinel removal
    (02.movielens-silver.py:135-152)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(c, sep)
    for sentinel in drop:
        arr = F.array_remove(arr, sentinel)
    return arr


def epoch_to_timestamp(col: Column | str) -> Column:
    """rating ts: to_timestamp(from_unixtime(x)) (02.movielens-silver.py:
    173-178)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c.cast("long"))


def snake_case_columns(df: DataFrame) -> DataFrame:
    """movieId → movie_id etc. (silver renaming convention,
    02.movielens-silver.py:135-215)."""
    def snake(name: str) -> str:
        return re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name).lower()

    return df.select(*[F.col(c).alias(snake(c)) for c in df.columns])


def assert_no_rescued_rows(df: DataFrame, col: str = "_rescued_data") -> DataFrame:
    """Silver-quality gate: rescued/corrupt rows must be 0
    (02.movielens-silver.py:117,169). Returns df without the rescue column;
    raises if any row was rescued."""
    if col not in df.columns:
        return df
    n = df.where(F.col(col).isNotNull()).count()
    if n:
        raise ValueError(f"{n} rescued rows present — bronze data is not clean")
    return df.drop(col)


# --------------------------------------------------------------------------- #
# gold: ALS recommender (X5 — 05.movielens/03.movielens-gold.py)
# --------------------------------------------------------------------------- #
def train_als(
    ratings: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    rank: int = 10,
    max_iter: int = 5,
    reg_param: float = 0.1,
    seed: int = 42,
):
    """ALS matrix factorization with the reference's hyperparameters
    (03.movielens-gold.py:63-72: rank=10, maxIter=5, regParam=0.1, seed=42).
    Returns the fitted model."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        seed=seed,
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        coldStartStrategy="drop",
    )
    return als.fit(ratings)


def tune_als(
    ratings: DataFrame,
    rank_grid: tuple[int, ...] = (5, 10),
    reg_grid: tuple[float, ...] = (0.1,),
    num_folds: int = 2,
    seed: int = 42,
):
    """Hyperparameter tuning via CrossValidator + ParamGridBuilder — the
    reference's gold-layer model selection (03.movielens-gold.py:88-129:
    3-fold CV over rank/regParam, RMSE evaluator). Returns (best_model,
    rmse_per_candidate)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.recommendation import ALS
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    als = ALS(
        maxIter=5, seed=seed, userCol="user_id", itemCol="item_id",
        ratingCol="rating", coldStartStrategy="drop",
    )
    grid = (
        ParamGridBuilder()
        .addGrid(als.rank, list(rank_grid))
        .addGrid(als.regParam, list(reg_grid))
        .build()
    )
    cv = CrossValidator(
        estimator=als,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(
            metricName="rmse", labelCol="rating", predictionCol="prediction"
        ),
        numFolds=num_folds,
        seed=seed,
    )
    model = cv.fit(ratings)
    return model.bestModel, list(model.avgMetrics)


def evaluate_rmse(model, test: DataFrame, rating_col: str = "rating") -> float:
    """RMSE on a held-out split (03.movielens-gold.py:110-129)."""
    from pyspark.ml.evaluation import RegressionEvaluator

    pred = model.transform(test)
    return RegressionEvaluator(
        metricName="rmse", labelCol=rating_col, predictionCol="prediction"
    ).evaluate(pred)


def recommend_for_all_users(model, k: int = 5) -> DataFrame:
    """recommendForAllUsers(k) flattened to (user, item, score) rows
    (03.movielens-gold.py:208,235)."""
    recs = model.recommendForAllUsers(k)
    user_col = recs.columns[0]
    return recs.select(
        F.col(user_col),
        F.posexplode("recommendations").alias("rnk", "rec"),
    ).select(
        user_col,
        (F.col("rnk") + 1).alias("rank"),
        F.col("rec.*"),
    )
