"""Exact Mann–Whitney AUC (operators/classify.auc_exact)."""

from __future__ import annotations

import pytest

from dbt_gdpr_anonymizer_spark.operators.classify import auc_exact


def _py_auc_ppm(pairs):
    """pairs: [(score, y)] — tie-average AUC in floor ppm, computed in
    doubled integer wins so the replay is exact like the operator."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    wins2 = 0  # doubled: 2 per strict win, 1 per tie
    for p in pos:
        for n in neg:
            wins2 += 2 if p > n else (1 if p == n else 0)
    return (1000000 * wins2) // (2 * len(pos) * len(neg))


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "s bigint, y boolean")
    row = auc_exact(df, "s", "y").collect()[0]
    return row


def test_perfect_separation_is_one(spark):
    pairs = [(10, True), (9, True), (2, False), (1, False)]
    row = _run(spark, pairs)
    assert (row.n_pos, row.n_neg, row.auc_ppm) == (2, 2, 1000000)


def test_reversed_separation_is_zero(spark):
    pairs = [(1, True), (2, True), (9, False), (10, False)]
    assert _run(spark, pairs).auc_ppm == 0


def test_all_tied_is_half(spark):
    pairs = [(5, True), (5, True), (5, False), (5, False), (5, False)]
    assert _run(spark, pairs).auc_ppm == 500000


def test_matches_python_replay_with_mixed_ties(spark):
    pairs = [
        (3, True), (3, False), (7, True), (1, False), (7, False),
        (9, True), (2, False), (4, True), (4, True), (0, False),
    ]
    row = _run(spark, pairs)
    assert row.auc_ppm == _py_auc_ppm(pairs)


def test_single_class_releases_null(spark):
    pairs = [(1, True), (2, True)]
    row = _run(spark, pairs)
    assert row.auc_ppm is None and row.n_neg == 0


def test_null_rows_excluded(spark):
    pairs = [(1, True), (None, True), (2, None), (0, False)]
    df = spark.createDataFrame(pairs, "s bigint, y boolean")
    row = auc_exact(df, "s", "y").collect()[0]
    assert (row.n_pos, row.n_neg) == (1, 1)
    assert row.auc_ppm == 1000000  # the surviving pos (1) beats neg (0)


def test_rejects_float_scores(spark):
    df = spark.createDataFrame([(1.5, True)], "s double, y boolean")
    with pytest.raises(TypeError, match="integral"):
        auc_exact(df, "s", "y")
