"""Numeric-distribution profiling (operators/profile.py): Benford
leading-digit conformity and exact histogram-based Gini."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.profile import (
    BENFORD_P,
    benford_profile,
    gini_concentration,
)


# ---------------------------------------------------------------- Benford


def _py_benford(values):
    counts = {d: 0 for d in range(1, 10)}
    for v in values:
        if v is None or abs(v) < 1:
            continue
        counts[int(str(int(math.floor(abs(v))))[0])] += 1
    n = sum(counts.values())
    chi2 = sum(
        (counts[d] - n * BENFORD_P[d]) ** 2 / (n * BENFORD_P[d])
        for d in range(1, 10)
    )
    mad = sum(
        abs(counts[d] / n - BENFORD_P[d]) for d in range(1, 10)
    ) / 9.0
    return counts, n, chi2, mad


def test_benford_counts_and_stats_match_python_replay(spark):
    vals = [
        float(v)
        for v in (1, 12, 19, 2, 25, 311, 47, 55, 6, 78, 92, 104, 1150, 13)
    ]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp_in string, val double"
    )
    row = benford_profile(df, "val", "grp_in").collect()[0]
    counts, n, chi2, mad = _py_benford(vals)
    assert row.n_total == n
    for d in range(1, 10):
        assert row[f"d{d}"] == counts[d], d
    assert row.chi2_e6 == math.floor(chi2 * 1e6)
    assert row.mad_ppm == math.floor(mad * 1e6)


def test_benford_excludes_nulls_and_sub_one_values(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", 0.5), ("g", -0.2), ("g", 7.0), ("g", -31.0)],
        "grp_in string, val double",
    )
    row = benford_profile(df, "val", "grp_in").collect()[0]
    assert row.n_total == 2
    assert row.d7 == 1 and row.d3 == 1  # abs() taken before the digit


def test_benford_exact_powers_of_ten_classify_as_one(spark):
    # the reason the digit comes from the decimal STRING: float log10
    # of 1000 can land at 2.9999999999999996 and misclassify
    df = spark.createDataFrame(
        [("g", 10.0), ("g", 100.0), ("g", 1000.0), ("g", 1e15)],
        "grp_in string, val double",
    )
    row = benford_profile(df, "val", "grp_in").collect()[0]
    assert row.d1 == 4


def test_benford_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 11.0), ("a", 22.0), ("b", 95.0)],
        "grp_in string, val double",
    )
    got = {r.grp: r for r in benford_profile(df, "val", "grp_in").collect()}
    assert got["a"].n_total == 2 and got["a"].d1 == 1 and got["a"].d2 == 1
    assert got["b"].n_total == 1 and got["b"].d9 == 1


# ------------------------------------------------------------------- Gini


def _py_gini(values):
    xs = sorted(values)
    n = len(xs)
    s = sum(xs)
    if s == 0:
        return None
    t = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * t - (n + 1) * s) / (n * s)


def _run_gini(spark, groups):
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp_in string, val bigint")
    return {
        r.grp: r for r in gini_concentration(df, "val", "grp_in").collect()
    }


def test_gini_all_equal_is_zero(spark):
    got = _run_gini(spark, {"g": [5, 5, 5, 5]})["g"]
    assert got.gini_e6 == 0
    assert got.n == 4 and got.sum_value == 20


def test_gini_single_holder_is_n_minus_1_over_n(spark):
    got = _run_gini(spark, {"g": [0, 0, 0, 100]})["g"]
    assert got.gini_e6 == math.floor((3 / 4) * 1e6)


def test_gini_matches_python_replay_with_ties(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 97, 0, 0, 2]
    got = _run_gini(spark, {"g": vals})["g"]
    want = _py_gini(vals)
    assert got.gini_e6 == math.floor(want * 1e6)
    assert got.n == len(vals) and got.sum_value == sum(vals)


def test_gini_zero_sum_group_releases_null(spark):
    got = _run_gini(spark, {"g": [0, 0, 0]})["g"]
    assert got.gini_e6 is None
    assert got.n == 3


def test_gini_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 3)], "grp_in string, val bigint"
    )
    got = gini_concentration(df, "val", "grp_in").collect()[0]
    assert got.n == 2 and got.sum_value == 4


def test_gini_rejects_float_input(spark):
    df = spark.createDataFrame([("g", 1.5)], "grp_in string, val double")
    with pytest.raises(TypeError, match="integral"):
        gini_concentration(df, "val", "grp_in")


def test_gini_groups_are_independent(spark):
    groups = {"a": [1, 1, 1], "b": [0, 0, 50, 50]}
    got = _run_gini(spark, groups)
    for g, vals in groups.items():
        assert got[g].gini_e6 == math.floor(_py_gini(vals) * 1e6), g


# ------------------------------------------------------------- changepoint


def _py_changepoint(rows):
    """rows: [(grp, period, count)] — replay of the scan contract."""
    from collections import defaultdict

    by_grp = defaultdict(list)
    for g, p, x in rows:
        by_grp[g].append((p, x))
    out = {}
    for g, seq in by_grp.items():
        seq.sort()
        xs = [x for _, x in seq]
        T, S = len(xs), sum(xs)
        st = 0
        for t in range(1, T):
            st += xs[t - 1]
            a = abs(st * (T - t) - (S - st) * t)
            out[(g, seq[t - 1][0])] = (t, (1000000 * a) // (t * (T - t)))
    return out


def _run_cp(spark, rows):
    from dbt_gdpr_anonymizer_spark.operators.profile import changepoint_scan

    df = spark.createDataFrame(rows, "grp string, period int, n bigint")
    got = changepoint_scan(df, "grp", "period", "n")
    return {(r.grp, r.period): (r.t, r.gap_ppm) for r in got.collect()}


def test_changepoint_matches_python_replay(spark):
    rows = [("a", p, 10) for p in range(1, 6)] + [
        ("a", p, 50) for p in range(6, 11)
    ]
    rows += [("b", p, (p * 13) % 7) for p in range(1, 9)]
    assert _run_cp(spark, rows) == _py_changepoint(rows)


def test_changepoint_peak_at_true_shift(spark):
    rows = [("a", p, 10) for p in range(1, 6)] + [
        ("a", p, 50) for p in range(6, 11)
    ]
    got = _run_cp(spark, rows)
    best = max(got.items(), key=lambda kv: kv[1][1])
    assert best[0] == ("a", 5)  # split after period 5 = the level shift


def test_changepoint_flat_series_scores_zero(spark):
    rows = [("a", p, 7) for p in range(1, 9)]
    got = _run_cp(spark, rows)
    assert all(v[1] == 0 for v in got.values())


def test_changepoint_single_period_group_releases_nothing(spark):
    got = _run_cp(spark, [("solo", 1, 5), ("b", 1, 1), ("b", 2, 9)])
    assert all(g != "solo" for (g, _) in got)


# ---------------------------------------------------------------- KS drift


def _py_ks(rows):
    """rows: [(grp, side, v)] — replay: exact KS in integer ppm."""
    from collections import defaultdict

    by_grp = defaultdict(lambda: ([], []))
    for g, s, v in rows:
        if v is not None:
            by_grp[g][s].append(v)
    out = {}
    for g, (a, b) in by_grp.items():
        n1, n2 = len(a), len(b)
        if n1 == 0 or n2 == 0:
            out[g] = (n1, n2, None)
            continue
        vals = sorted(set(a) | set(b))
        best, c1, c2 = 0, 0, 0
        for v in vals:
            c1 += sum(1 for x in a if x == v)
            c2 += sum(1 for x in b if x == v)
            best = max(best, (1000000 * abs(c1 * n2 - c2 * n1)) // (n1 * n2))
        out[g] = (n1, n2, best)
    return out


def _run_ks(spark, rows):
    from dbt_gdpr_anonymizer_spark.operators.profile import ks_drift

    df = spark.createDataFrame(rows, "grp string, side int, v bigint")
    got = ks_drift(df, "grp", "side", "v")
    return {r.grp: (r.n1, r.n2, r.ks_ppm) for r in got.collect()}


def test_ks_matches_python_replay(spark):
    rows = (
        [("a", 0, v) for v in [1, 2, 2, 3, 5, 8, 9]]
        + [("a", 1, v) for v in [4, 5, 6, 6, 7, 9]]
        + [("b", 0, v) for v in [1, 1, 1]]
        + [("b", 1, v) for v in [1, 1, 2]]
    )
    assert _run_ks(spark, rows) == _py_ks(rows)


def test_ks_identical_samples_zero(spark):
    rows = [("g", s, v) for s in (0, 1) for v in [3, 7, 7, 11]]
    assert _run_ks(spark, rows)["g"] == (4, 4, 0)


def test_ks_disjoint_samples_full_distance(spark):
    rows = [("g", 0, v) for v in [1, 2, 3]] + [
        ("g", 1, v) for v in [10, 11, 12]
    ]
    assert _run_ks(spark, rows)["g"] == (3, 3, 1000000)


def test_ks_missing_side_releases_null(spark):
    rows = [("g", 0, 5), ("g", 0, 6)]
    assert _run_ks(spark, rows)["g"] == (2, 0, None)


def test_ks_rejects_float_values(spark):
    import pytest as _pytest

    from dbt_gdpr_anonymizer_spark.operators.profile import ks_drift

    df = spark.createDataFrame([("g", 0, 1.5)], "grp string, side int, v double")
    with _pytest.raises(TypeError, match="integral"):
        ks_drift(df, "grp", "side", "v")


# ----------------------------------------------------------------- Spearman


def _py_spearman(pairs):
    """pairs: [(x, y)] — tie-average Spearman, exact replay."""

    def avg_ranks(vals):
        order = sorted(set(vals))
        f, out = 0, {}
        from collections import Counter

        cnt = Counter(vals)
        for v in order:
            c = cnt[v]
            out[v] = f + (c + 1) / 2
            f += c
        return [out[v] for v in vals]

    xs = avg_ranks([p[0] for p in pairs])
    ys = avg_ranks([p[1] for p in pairs])
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return (n * sxy - sx * sy) / (vx * vy) ** 0.5


def _run_spearman(spark, groups):
    from dbt_gdpr_anonymizer_spark.operators.profile import spearman_corr

    rows = [(g, x, y) for g, ps in groups.items() for x, y in ps]
    df = spark.createDataFrame(rows, "grp string, x bigint, y bigint")
    got = spearman_corr(df, "grp", "x", "y")
    return {r.grp: (r.n, r.spearman_e6) for r in got.collect()}


def test_spearman_perfect_monotone_is_one(spark):
    ps = [(i, i * i) for i in range(1, 9)]  # nonlinear but monotone
    assert _run_spearman(spark, {"g": ps})["g"] == (8, 1000000)


def test_spearman_perfect_inverse_is_minus_one(spark):
    ps = [(i, 100 - i) for i in range(1, 9)]
    n, r = _run_spearman(spark, {"g": ps})["g"]
    assert (n, r) == (8, -1000000)


def test_spearman_matches_python_replay_with_ties(spark):
    import math

    ps = [(3, 9), (1, 2), (4, 2), (1, 5), (5, 5), (9, 7), (2, 2), (6, 5)]
    n, r = _run_spearman(spark, {"g": ps})["g"]
    want = _py_spearman(ps)
    assert n == len(ps)
    assert r == math.floor(want * 1e6)


def test_spearman_zero_variance_releases_null(spark):
    ps = [(5, i) for i in range(1, 6)]
    assert _run_spearman(spark, {"g": ps})["g"] == (5, None)


def test_spearman_null_pairs_excluded(spark):
    from dbt_gdpr_anonymizer_spark.operators.profile import spearman_corr

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", None, 9), ("g", 2, None), ("g", 3, 3)],
        "grp string, x bigint, y bigint",
    )
    got = spearman_corr(df, "grp", "x", "y").collect()[0]
    assert got.n == 2


def test_spearman_rejects_float_input(spark):
    import pytest as _pytest

    from dbt_gdpr_anonymizer_spark.operators.profile import spearman_corr

    df = spark.createDataFrame(
        [("g", 1.5, 2)], "grp string, x double, y bigint"
    )
    with _pytest.raises(TypeError, match="integral"):
        spearman_corr(df, "grp", "x", "y")
