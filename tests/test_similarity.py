

def test_kmeans_driver_and_distributed_paths_agree(spark):
    """The numpy driver-fit fast path (r7) and the distributed Lloyd loop
    must produce the same cell ASSIGNMENTS on well-separated clusters —
    the invariant the oracle's ulp-tolerance argument rests on. (The
    distributed path is the 100 TB tier; driver_fit_max=0 forces it.)"""
    from dbt_gdpr_anonymizer_spark.operators.similarity import (
        ivf_assign,
        kmeans_fit,
    )

    # three tight, well-separated clusters in 4-d
    def pt(base, j):
        v = [0.0] * 4
        v[base] = 10.0
        v[(base + 1) % 4] = 0.01 * j
        return v

    rows = [
        (c * 100 + j, pt(c, j)) for c in range(3) for j in range(8)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def cells(**kw):
        cents = kmeans_fit(df, k=3, iters=3, fit_sample_n=None, **kw)
        return {
            r["vec_id"]: r["cell"]
            for r in ivf_assign(df, cents).collect()
        }

    fast = cells()  # 24 rows << 200k -> numpy path
    dist = cells(driver_fit_max=0)  # forced distributed loop
    assert fast == dist
    # and the assignment actually separates the three planted clusters
    groups = {}
    for vid, cell in fast.items():
        groups.setdefault(cell, set()).add(vid // 100)
    assert all(len(bases) == 1 for bases in groups.values())
    assert len(groups) == 3


# ---------------------------------------------------------------------------
# X132 positional phrase search
# ---------------------------------------------------------------------------


def test_phrase_search_basic_and_multi_match(spark):
    from dbt_gdpr_anonymizer_spark.operators.similarity import phrase_search

    df = spark.createDataFrame(
        [
            (1, "x slow hash batch y slow hash batch"),
            (2, "slow hash batch"),
            (3, "slow hash x batch"),  # not adjacent
            (4, "batch hash slow"),  # wrong order
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, ["slow", "hash", "batch"]).collect()
    }
    assert rows == {1: (2, 1), 2: (1, 0)}


def test_phrase_search_repeated_term_and_overlap(spark):
    from dbt_gdpr_anonymizer_spark.operators.similarity import phrase_search

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a a a")],
        "doc_id long, text string",
    )
    # "a b a": matches at 0 and 2 in doc1 (overlapping); none in doc2
    rows = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, ["a", "b", "a"]).collect()
    }
    assert rows == {1: (2, 0)}
    # "a a": doc2 has anchors 0 and 1
    rows = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, ["a", "a"]).collect()
    }
    assert rows[2] == (2, 0)


def test_phrase_search_single_word_and_empty(spark):
    import pytest

    from dbt_gdpr_anonymizer_spark.operators.similarity import phrase_search

    df = spark.createDataFrame(
        [(1, "q w q"), (2, "zz")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, ["q"]).collect()
    }
    assert rows == {1: (2, 0)}
    with pytest.raises(ValueError, match="non-empty"):
        phrase_search(df, [])


def test_hard_negatives_exclusions_and_ceiling(spark):
    """X140: the mined set never contains the query or its positive, the
    ceiling drops near-duplicates, and ranking is by integral ppm."""
    from dbt_gdpr_anonymizer_spark.operators.similarity import hard_negatives

    # 1-d-ish vectors padded to dim 4: controlled cosines
    def v(*xs):
        return list(map(float, xs))

    rows = [
        (0, v(1, 0, 0, 0)),     # query
        (1, v(1, 0.01, 0, 0)),  # its positive (near-dup, excluded by id)
        (2, v(1, 0.02, 0, 0)),  # unlabeled near-dup -> ceiling cut
        (3, v(1, 1, 0, 0)),     # a hard negative
        (4, v(0, 1, 0, 0)),     # orthogonal-ish
        (5, v(1, 0.5, 0, 0)),   # another negative
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = spark.createDataFrame([(0, 1)], ["query_id", "pos_id"])
    got = hard_negatives(
        emb, pairs, k=10, dim=4, bits=1, sim_ceiling_ppm=999000
    ).collect()
    ids = [r["neg_id"] for r in got]
    assert 0 not in ids and 1 not in ids  # self + positive excluded
    assert 2 not in ids                   # ceiling cut (cos ~0.9998)
    assert set(ids) <= {3, 4, 5}
    # hardest (most similar) negative first
    by_rank = [r["neg_id"] for r in sorted(
        got, key=lambda r: -r["cos_sim_ppm"])]
    assert by_rank[0] == 5  # cos(q,5) > cos(q,3) > cos(q,4)


class TestCentroidDriftInt8:
    def test_identical_cohorts_zero_drift(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            centroid_drift_int8,
        )

        # ids 0/1 and 2/3 carry the same vector -> both cohorts have the
        # same centroid -> drift_num must be exactly 0
        rows = [
            (0, [1.0, 5.0, 9.0], 7),
            (1, [1.0, 5.0, 9.0], 7),
            (2, [4.0, 0.0, 2.0], 7),
            (3, [4.0, 0.0, 2.0], 7),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        got = centroid_drift_int8(df).collect()
        assert [(r.label, r.n_a, r.n_b, r.drift_num) for r in got] == [
            (7, 2, 2, 0)
        ]

    def test_shifted_cohort_detected(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            centroid_drift_int8,
        )

        rows = [
            (0, [0.0, 1.0], 1),   # cohort A
            (1, [1.0, 0.0], 1),   # cohort B: opposite corner
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        r = centroid_drift_int8(df).collect()[0]
        # quantized: [0,1]->[-128,127], [1,0]->[127,-128]; nA=nB=1
        # drift = |−128·1 − 127·1| + |127·1 − (−128)·1| = 255 + 255
        assert (r.n_a, r.n_b, r.drift_num) == (1, 1, 510)

    def test_groups_independent(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            centroid_drift_int8,
        )

        rows = [
            (0, [0.0, 1.0], 1), (1, [0.0, 1.0], 1),
            (2, [0.0, 1.0], 2), (3, [1.0, 0.0], 2),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        got = {r.label: r.drift_num for r in centroid_drift_int8(df).collect()}
        assert got[1] == 0 and got[2] == 510
