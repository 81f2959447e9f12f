"""X130 exact int8 embedding covariance (operators/similarity.
int8_covariance): hand-computed sufficient statistics, constant-vector
quantization, and the no-UDF aggregation-only plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.similarity import int8_covariance


def test_hand_computed_two_vectors(spark):
    # [0,1] -> [-128,127]; [1,0] -> [127,-128]
    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {(r.i, r.j): r for r in int8_covariance(df).collect()}
    assert set(rows) == {(0, 0), (0, 1), (1, 1)}
    r = rows[(0, 0)]
    assert (r.n_vecs, r.s_i, r.s_j, r.s_ij) == (2, -1, -1, 32513)
    assert r.cov_num == 2 * 32513 - 1
    r = rows[(0, 1)]
    assert (r.s_i, r.s_j, r.s_ij) == (-1, -1, -32512)
    assert r.cov_num == 2 * -32512 - 1
    assert rows[(1, 1)].cov_num == 2 * 32513 - 1


def test_constant_vectors_quantize_to_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 0.5, 0.5]), (2, [2.0, 2.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    for r in int8_covariance(df).collect():
        assert (r.s_i, r.s_j, r.s_ij, r.cov_num) == (0, 0, 0, 0)


def test_pair_count_and_plan(spark):
    d = 5
    df = spark.createDataFrame(
        [(i, [float(i + k) for k in range(d)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = int8_covariance(df)
    assert out.count() == d * (d + 1) // 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # aggregation-only: no joins anywhere in the plan
    assert "Join" not in plan
