"""Round-12 optimization pins: the structural properties each r12 change
established, so a later refactor can't silently reintroduce the waste.

- explode_nonempty: semantics identical to plain explode for arrays with
  non-null elements (incl. empty and NULL arrays), and the minhash banding
  plan evaluates the 32-hash signature expression ONCE (the inferred
  size>0 filter used to duplicate it below the projection).
- _emb_unit: the norm aggregate appears once per row, outside every
  lambda (CollapseProject used to inline the single-use __n alias into the
  divide lambda, making normalization O(d^2) per row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouses_spark.io import explode_nonempty, load_table

SF = "/root/testdata/sf0.01"


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_explode_nonempty_matches_explode_semantics(spark):
    rows = [
        (1, ["a", "b"]),
        (2, []),          # empty array: no output row either way
        (3, None),        # NULL array: no output row either way
        (4, ["c"]),
    ]
    df = spark.createDataFrame(rows, "id int, xs array<string>")
    via_explode = df.select("id", F.explode("xs").alias("x")).collect()
    via_helper = explode_nonempty(df, F.col("xs"), "x", "id").collect()
    assert sorted(via_explode) == sorted(via_helper)
    assert sorted(r.id for r in via_helper) == [1, 1, 4]


def test_minhash_banding_evaluates_signature_once(spark):
    """The banding plan must contain the xxhash64 signature expression
    exactly once — a plain explode makes InferFiltersFromGenerate duplicate
    the whole 32-hash expression into an inferred size>0 filter."""
    from lakehouses_spark.io import spread
    from lakehouses_spark.queries.dedup import (
        hashed_shingle_sets,
        minhash_buckets,
        with_doc_twins,
    )

    d = spread(with_doc_twins(load_table(spark, SF, "documents")))
    ss = hashed_shingle_sets(d).localCheckpoint()
    banded = explode_nonempty(minhash_buckets(ss), "buckets", "bucket", "doc_id")
    plan = _plan_of(banded)
    # each signature component j contributes one xxhash64(h, j) per
    # evaluation site; duplication doubles the count for every j
    assert plan.count("xxhash64(lambda x") == 32, (
        "minhash signature expression evaluated more than once per row "
        f"({plan.count('xxhash64(lambda x')} lambda-hash sites; expected 32)"
    )


def test_emb_unit_norm_outside_lambda(spark):
    """_emb_unit's norm must be evaluated once per row: the aggregate may
    appear only as array_repeat's argument, never inside the element-wise
    divide lambda (where it would re-run per element, O(d^2)/row)."""
    from lakehouses_spark.queries.similarity import _emb_unit

    emb = load_table(spark, SF, "embeddings")
    u = _emb_unit(emb).select("vec_id", "unit")
    plan = _plan_of(u)
    assert plan.count("aggregate(zip_with") == 1, plan[:2000]
    assert "array_repeat" in plan
    # and the unit vectors really are unit-length
    n = F.sqrt(
        F.aggregate(
            F.zip_with("unit", "unit", lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    bad = _emb_unit(emb).where(F.abs(n - 1.0) > 1e-9).count()
    assert bad == 0
