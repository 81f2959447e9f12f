

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
