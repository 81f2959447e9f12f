"""Connected-components operator tests."""

from __future__ import annotations

from dbt_gdpr_anonymizer_spark.operators.graph import connected_components


def _components(spark, edges, iters=4, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, iters=iters, **kw).collect()
    return {r["node"]: r["component"] for r in out}


def test_chain_collapses_to_min_label(spark):
    # path 1-2-3-4 plus separate pair 10-11: two components
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_round_budget_bounds_propagation(spark):
    # a 6-path has diameter 5: 2 rounds must NOT fully converge, 5 must
    edges = [(i, i + 1) for i in range(1, 6)]
    partial = _components(spark, edges, iters=2)
    assert partial[6] != 1  # farthest node not yet reached
    full = _components(spark, edges, iters=5)
    assert set(full.values()) == {1}


def test_checkpoint_variant_same_result(spark):
    edges = [(1, 2), (2, 3), (5, 6)]
    assert _components(spark, edges) == _components(
        spark, edges, checkpoint=True
    )
