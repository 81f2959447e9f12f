"""Johnson–Lindenstrauss ±1 projection over the int8 tier
(operators/similarity.jl_project_int8)."""

from __future__ import annotations

import hashlib
import math

from dbt_gdpr_anonymizer_spark.operators.similarity import (
    _jl_sign_matrix,
    jl_project_int8,
)


def _py_quantize(vec):
    mn, mx = min(vec), max(vec)
    if mx > mn:
        return [
            int(math.floor((float(x) - mn) * 255.0 / (mx - mn))) - 128
            for x in vec
        ]
    return [0] * len(vec)


def _py_project(rows, out_dim, salt="jl"):
    out = {}
    for vid, vec in rows:
        q = _py_quantize(vec)
        for j in range(out_dim):
            p = 0
            for i, x in enumerate(q):
                nib = int(
                    hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[0],
                    16,
                )
                p += x if nib % 2 == 0 else -x
            out[(vid, j)] = p
    return out


def _mk(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_matches_python_replay(spark):
    rows = [
        (1, [0.5, -1.25, 3.0, 2.0]),
        (2, [10.0, 10.0, 10.0, 10.0]),  # constant vector -> zeros
        (3, [-4.0, 0.0, 4.0, 8.5]),
    ]
    got = {
        (r.vec_id, r.j): r.p
        for r in jl_project_int8(_mk(spark, rows), out_dim=8).collect()
    }
    assert got == _py_project(rows, 8)


def test_sign_matrix_is_deterministic_and_pm_one(spark):
    m1 = _jl_sign_matrix(6, 4, "jl")
    m2 = _jl_sign_matrix(6, 4, "jl")
    assert (m1 == m2).all()
    assert set(m1.reshape(-1).tolist()) <= {-1, 1}
    # a different salt decorrelates
    assert (m1 != _jl_sign_matrix(6, 4, "other")).any()


def test_projection_is_linear_in_quantized_space(spark):
    # p(q) = q @ S, so a vector quantizing to all zeros projects to zeros
    rows = [(7, [2.0, 2.0, 2.0])]
    got = jl_project_int8(_mk(spark, rows), out_dim=5).collect()
    assert len(got) == 5 and all(r.p == 0 for r in got)


def test_long_form_shape(spark):
    rows = [(i, [float(i), float(i + 1), 0.0, -1.0]) for i in range(10)]
    got = jl_project_int8(_mk(spark, rows), out_dim=16).collect()
    assert len(got) == 160
    assert {r.j for r in got} == set(range(16))


def test_bound_on_magnitude(spark):
    # |p_j| <= 128 * dim by construction
    rows = [(1, [float(x) for x in range(64)])]
    got = jl_project_int8(_mk(spark, rows), out_dim=16).collect()
    assert all(abs(r.p) <= 128 * 64 for r in got)


def test_non_integral_id_rejected(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", [1.0, 2.0])], "vec_id string, embedding array<float>"
    )
    with pytest.raises(TypeError, match="integral"):
        jl_project_int8(df, out_dim=4)


def test_ragged_dims_rejected_at_plan_time(spark):
    # corpus-level guard: a ragged corpus fails DRIVER-side (one
    # distinct-size aggregate) even when every Arrow batch would be
    # internally uniform — the silent cross-batch mixed-matrix case
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id bigint, embedding array<float>",
    ).repartition(2)
    with pytest.raises(ValueError, match="ragged vector dimensions"):
        jl_project_int8(df, out_dim=4)


def test_pinned_dim_mismatch_rejected_in_batch(spark):
    # with dim= pinned (skipping the corpus aggregate), a wrong-dim
    # batch still raises instead of projecting with the wrong matrix
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(Exception, match="!= expected"):
        jl_project_int8(df, out_dim=4, dim=8).collect()
