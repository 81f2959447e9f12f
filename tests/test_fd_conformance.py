"""Functional-dependency conformance (operators/validate.fd_conformance)."""

from __future__ import annotations

from dbt_gdpr_anonymizer_spark.operators.validate import fd_conformance


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k string, r string")
    return fd_conformance(df, ["k"], "r").collect()[0]


def test_holding_fd_is_fully_conformant(spark):
    got = _run(spark, [("a", "x"), ("a", "x"), ("b", "y")])
    assert (got.n_groups, got.n_violating, got.n_rows_violating) == (2, 0, 0)
    assert got.conformance_ppm == 1000000


def test_violations_counted_with_row_mass(spark):
    got = _run(
        spark,
        [("a", "x"), ("a", "y"), ("a", "y"), ("b", "z"), ("c", "w")],
    )
    assert (got.n_groups, got.n_violating, got.n_rows_violating) == (3, 1, 3)
    assert got.conformance_ppm == (2 * 1000000) // 3


def test_null_rhs_ignored(spark):
    # a group whose only second value is NULL still conforms
    got = _run(spark, [("a", "x"), ("a", None), ("b", None)])
    assert (got.n_groups, got.n_violating) == (2, 0)


def test_empty_frame_releases_null_ppm(spark):
    df = spark.createDataFrame([], "k string, r string")
    got = fd_conformance(df, ["k"], "r").collect()[0]
    assert got.n_groups == 0 and got.conformance_ppm is None


def test_composite_lhs(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("a", 2, "z")],
        "k string, j int, r string",
    )
    got = fd_conformance(df, ["k", "j"], "r").collect()[0]
    assert (got.n_groups, got.n_violating) == (2, 1)
