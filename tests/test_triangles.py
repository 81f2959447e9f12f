"""Degree-oriented triangle counting (operators/graph.triangle_count)."""

from __future__ import annotations

from itertools import combinations

from dbt_gdpr_anonymizer_spark.operators.graph import triangle_count


def _py_triangles(edges):
    adj = {}
    es = set()
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        es.add((a, b))
    nodes = sorted({n for e in es for n in e})
    counts = dict.fromkeys(nodes, 0)
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in es) and ((b, c) in es) and ((a, c) in es):
            for n in (a, b, c):
                counts[n] += 1
    return {n: c for n, c in counts.items() if c > 0}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.node: r.n_triangles for r in triangle_count(df).collect()
    }


def test_single_triangle(spark):
    assert _run(spark, [(1, 2), (2, 3), (3, 1)]) == {1: 1, 2: 1, 3: 1}


def test_k4_has_four_triangles_three_per_node(spark):
    edges = [(a, b) for a, b in combinations([1, 2, 3, 4], 2)]
    got = _run(spark, edges)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_matches_brute_force_on_jumbled_graph(spark):
    edges = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (5, 1),
        (6, 7), (7, 8), (2, 2), (3, 2),  # self-loop + duplicate
        (9, 10),
    ]
    assert _run(spark, edges) == _py_triangles(edges)


def test_triangle_free_graph_releases_nothing(spark):
    # a path and a star: no triangles
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13)]
    assert _run(spark, edges) == {}


def test_endpoint_order_and_duplicates_ignored(spark):
    a = _run(spark, [(1, 2), (2, 3), (3, 1)])
    b = _run(spark, [(2, 1), (3, 2), (1, 3), (1, 2), (1, 2)])
    assert a == b
