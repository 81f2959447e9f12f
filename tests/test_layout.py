"""operators/layout: X178 Z-order (Morton) clustering keys."""

import pytest


def _replay(rows, bits):
    """Pure-python quantize+interleave replay of zorder_key."""
    n = len(rows[0])
    top = (1 << bits) - 1
    mns = [min(r[j] for r in rows) for j in range(n)]
    mxs = [max(r[j] for r in rows) for j in range(n)]
    out = []
    for r in rows:
        q = [
            0
            if mxs[j] == mns[j]
            else (r[j] - mns[j]) * top // (mxs[j] - mns[j])
            for j in range(n)
        ]
        z = 0
        for i in range(bits):
            for j in range(n):
                z |= ((q[j] >> i) & 1) << (i * n + j)
        out.append(z)
    return out


def test_zorder_matches_python_replay(spark):
    from dbt_gdpr_anonymizer_spark.operators.layout import zorder_key

    rows = [(3, 900), (17, 14), (0, 0), (255, 255), (128, 511), (7, 7)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r.a, r.b): r.zkey
        for r in zorder_key(df, ["a", "b"], bits=8).collect()
    }
    want = dict(zip(rows, _replay(rows, 8)))
    assert got == want


def test_zorder_three_columns_and_bit_disjointness(spark):
    from dbt_gdpr_anonymizer_spark.operators.layout import zorder_key

    rows = [(i, (i * 7) % 16, (i * 3) % 16) for i in range(16)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    got = {
        (r.a, r.b, r.c): r.zkey
        for r in zorder_key(df, ["a", "b", "c"], bits=4).collect()
    }
    want = dict(zip(rows, _replay(rows, 4)))
    assert got == want
    # 3 cols x 4 bits => keys fit 12 bits
    assert all(0 <= z < (1 << 12) for z in got.values())


def test_zorder_constant_column_contributes_zero(spark):
    from dbt_gdpr_anonymizer_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], ["a", "b"])
    rows = zorder_key(df, ["a", "b"], bits=4).collect()
    # b is constant -> quantizes to 0 -> odd bits all zero
    for r in rows:
        assert r.zkey & 0xAAAA == 0


def test_zorder_locality_beats_single_sort(spark):
    """The point of the curve: bucketing by zkey narrows BOTH dims'
    per-bucket ranges, while bucketing by a sort on one column leaves
    the other dimension's per-bucket range at full width."""
    from dbt_gdpr_anonymizer_spark.operators.layout import (
        zorder_layout_stats,
    )

    # a 32x32 grid: column-major id order means sorting by id clusters
    # `x` but leaves `y` spanning the full 0..31 in every slice
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["x", "y"])
    stats = zorder_layout_stats(
        df, ["x", "y"], bits=5, n_buckets=16
    ).collect()
    assert sum(r.n_rows for r in stats) == 1024
    # every z-bucket's y-range is a strict subset of the full domain
    for r in stats:
        assert r.y_max - r.y_min <= 7, (r.zbucket, r.y_min, r.y_max)
        assert r.x_max - r.x_min <= 7, (r.zbucket, r.x_min, r.x_max)


def test_zorder_rejects_float_column(spark):
    from dbt_gdpr_anonymizer_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(1, 1.5)], ["a", "b"])
    with pytest.raises(TypeError, match="integral"):
        zorder_key(df, ["a", "b"])


def test_zorder_rejects_key_overflow(spark):
    from dbt_gdpr_anonymizer_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="BIGINT"):
        zorder_key(df, ["a", "b"], bits=32)


def test_zorder_plan_is_single_broadcast_stats_join(spark):
    """The key computation must add NO shuffle: the only join is the
    1-row stats broadcast; the interleave is pure codegen."""
    from dbt_gdpr_anonymizer_spark.operators.layout import zorder_key

    df = spark.range(100).selectExpr("id as a", "id * 3 as b")
    plan = (
        zorder_key(df, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
