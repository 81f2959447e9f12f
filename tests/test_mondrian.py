"""Mondrian multidimensional k-anonymity
(operators/privacy.mondrian_partition)."""

from __future__ import annotations

import pytest

from dbt_gdpr_anonymizer_spark.operators.privacy import mondrian_partition


def _py_mondrian(rows, ndims, k, rounds):
    parts = {1: list(rows)}
    for _ in range(rounds):
        new = {}
        for pid, rs in parts.items():
            ranges = [
                max(r[i] for r in rs) - min(r[i] for r in rs)
                for i in range(ndims)
            ]
            cd = ranges.index(max(ranges))  # earliest argmax == >= chain
            vals = sorted(r[cd] for r in rs)
            n = len(vals)
            med = vals[(n + 1) // 2 - 1]
            nle = sum(1 for v in vals if v <= med)
            if nle >= k and n - nle >= k:
                new[2 * pid] = [r for r in rs if r[cd] <= med]
                new[2 * pid + 1] = [r for r in rs if r[cd] > med]
            else:
                new[pid] = rs
        parts = new
    out = {}
    for pid, rs in parts.items():
        box = []
        for i in range(ndims):
            box += [min(r[i] for r in rs), max(r[i] for r in rs)]
        out[pid] = (len(rs), tuple(box))
    return out


def _run(spark, rows, k, rounds=6):
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = mondrian_partition(df, ["x", "y"], k, rounds=rounds)
    return {
        r.pid: (r.n, (r.x_min, r.x_max, r.y_min, r.y_max))
        for r in got.collect()
    }


def _grid(nx, ny):
    return [(i, j) for i in range(nx) for j in range(ny)]


def test_matches_python_replay_on_grid(spark):
    rows = _grid(8, 4)
    assert _run(spark, rows, 4) == _py_mondrian(rows, 2, 4, 6)


def test_matches_python_replay_on_skewed_data(spark):
    rows = [((i * 7) % 23, (i * 13) % 5) for i in range(60)]
    assert _run(spark, rows, 6) == _py_mondrian(rows, 2, 6, 6)


def test_every_class_at_least_k(spark):
    rows = [((i * 31) % 17, (i * 11) % 9) for i in range(80)]
    got = _run(spark, rows, 10)
    assert all(n >= 10 for n, _ in got.values())
    assert sum(n for n, _ in got.values()) == 80


def test_extra_rounds_are_idempotent(spark):
    rows = _grid(6, 6)  # 36 rows, k=10: tree exhausts quickly
    assert _run(spark, rows, 10, rounds=4) == _run(spark, rows, 10, rounds=7)


def test_widest_dimension_splits_first(spark):
    # x spans 0..99, y spans 0..1: the first split must cut x
    rows = [(i, i % 2) for i in range(100)]
    got = _run(spark, rows, 10)
    # no class may span the full x range after a split happened
    assert len(got) > 1
    assert all(b[1] - b[0] < 99 for _, b in got.values())


def test_unsplittable_below_2k_released_whole(spark):
    rows = _grid(3, 3)  # 9 rows < 2k for k=5
    got = _run(spark, rows, 5)
    assert got == {1: (9, (0, 2, 0, 2))}


def test_rejects_float_dims(spark):
    df = spark.createDataFrame([(1.5, 2)], "x double, y bigint")
    with pytest.raises(TypeError, match="integral"):
        mondrian_partition(df, ["x", "y"], 2)
