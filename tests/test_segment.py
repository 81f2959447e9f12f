"""RFM quintile segmentation (operators/segment.rfm_segments)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from dbt_gdpr_anonymizer_spark.operators.segment import rfm_segments


def _d(day):
    return dt.datetime(2024, 1, day)


def _py_rfm(orders):
    """orders: [(cust, date, amount)] — replay of the operator contract."""
    per = {}
    for c, d, a in orders:
        m = per.setdefault(c, [d, 0, 0])
        m[0] = max(m[0], d)
        m[1] += 1
        m[2] += a
    gmax = max(m[0] for m in per.values())
    mm = {
        c: ((gmax - m[0]).days, m[1], m[2]) for c, m in per.items()
    }

    def quint(vals):
        xs = sorted(vals)
        n = len(xs)
        return [xs[math.ceil(k * n / 5) - 1] for k in (1, 2, 3, 4)]

    qs = [quint([v[i] for v in mm.values()]) for i in range(3)]

    def score(v, q):
        for k, b in enumerate(q, start=1):
            if v <= b:
                return k
        return 5

    grid = {}
    for c, (r, f, m) in mm.items():
        key = (score(r, qs[0]), score(f, qs[1]), score(m, qs[2]))
        g = grid.setdefault(key, [0, 0])
        g[0] += 1
        g[1] += m
    return {k: tuple(v) for k, v in grid.items()}


def _run(spark, orders):
    df = spark.createDataFrame(
        orders, "cust bigint, odate timestamp, amt bigint"
    )
    got = rfm_segments(df, "cust", "odate", "amt")
    return {
        (r.r_score, r.f_score, r.m_score): (r.n_customers, r.sum_monetary)
        for r in got.collect()
    }


def test_matches_python_replay(spark):
    orders = []
    for c in range(1, 26):
        for j in range((c % 4) + 1):
            orders.append((c, _d((c * 7 + j * 3) % 28 + 1), (c * 131) % 997))
    assert _run(spark, orders) == _py_rfm(orders)


def test_every_released_row_is_an_aggregate(spark):
    orders = [(c, _d(c), c * 10) for c in range(1, 11)]
    got = _run(spark, orders)
    assert sum(v[0] for v in got.values()) == 10


def test_single_customer_scores_all_ones(spark):
    # one customer: every quintile boundary equals their value, so each
    # score is 1 (v <= q1)
    got = _run(spark, [(1, _d(5), 100), (1, _d(9), 50)])
    assert got == {(1, 1, 1): (1, 150)}


def test_ties_share_a_score(spark):
    # identical metrics -> identical scores -> one cell with all rows
    orders = [(c, _d(10), 77) for c in range(1, 8)]
    got = _run(spark, orders)
    assert list(got.values()) == [(7, 7 * 77)]


def test_rejects_float_amount(spark):
    df = spark.createDataFrame(
        [(1, _d(1), 1.5)], "cust bigint, odate timestamp, amt double"
    )
    with pytest.raises(TypeError, match="integral"):
        rfm_segments(df, "cust", "odate", "amt")
