

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


class TestProductQuantization:
    def _vecs(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_fit_matches_per_subspace_kmeans(self, spark):
        """pq_fit == kmeans_fit_model run independently on each
        contiguous subvector slice (same seeding/tie/update semantics)."""
        from pyspark.sql import functions as F

        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            kmeans_fit_model,
            pq_fit,
        )

        rows = [
            (i, [float((i * 7 + d * 3) % 11 - 5) for d in range(8)])
            for i in range(30)
        ]
        df = self._vecs(spark, rows)
        got = pq_fit(df, m=2, dim=8, k=3, iters=2, fit_sample_n=None)
        for j in range(2):
            sub = df.select(
                "vec_id",
                F.slice("embedding", j * 4 + 1, 4).alias("embedding"),
            )
            ref = kmeans_fit_model(sub, 3, iters=2, fit_sample_n=None)
            assert got[j] == ref, f"subspace {j}"

    def test_fit_validations(self, spark):
        import pytest

        from dbt_gdpr_anonymizer_spark.operators.similarity import pq_fit

        df = self._vecs(spark, [(1, [1.0, 2.0, 3.0, 4.0])])
        with pytest.raises(ValueError, match="divisible"):
            pq_fit(df, m=3, dim=4, k=1, fit_sample_n=None)
        with pytest.raises(ValueError, match="driver_fit_max"):
            pq_fit(
                df, m=2, dim=4, k=1, fit_sample_n=None, driver_fit_max=0
            )
        with pytest.raises(ValueError, match="empty"):
            pq_fit(df.limit(0), m=2, dim=4, k=1, fit_sample_n=None)

    def test_adc_topk_matches_bruteforce_reference(self, spark):
        """ADC ranks == python brute force over the same codes/codebooks
        (dot-fold order mirrored), self excluded, ties by id."""
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            pq_adc_topk,
            pq_encode,
            pq_fit,
        )

        rows = [
            (i, [float(((i + 1) * (d + 2) * 13) % 17 - 8) for d in range(8)])
            for i in range(25)
        ]
        df = self._vecs(spark, rows)
        models = pq_fit(df, m=2, dim=8, k=4, iters=2, fit_sample_n=None)
        queries = df.filter("vec_id < 3").select(
            df.vec_id.alias("query_id"), "embedding"
        )
        got = {}
        for r in pq_adc_topk(df, queries, models, k=4).collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["vec_id"])
            )
        codes = {
            r["vec_id"]: (r["code_0"], r["code_1"])
            for r in pq_encode(df, models).collect()
        }

        def dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        vec = dict(rows)
        for qid in (0, 1, 2):
            q = vec[qid]
            scored = []
            for vid, v in rows:
                if vid == qid:
                    continue
                c0, c1 = codes[vid]
                s = dot(q[0:4], models[0][c0]) + dot(q[4:8], models[1][c1])
                scored.append((-s, vid))
            scored.sort()
            expect = [(rk + 1, vid) for rk, (_, vid) in enumerate(scored[:4])]
            assert sorted(got[qid]) == expect, qid

    def test_encode_is_narrow_no_shuffle(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            pq_encode,
            pq_fit,
        )

        rows = [(i, [float(i % 5), 1.0, 2.0, float(i % 3)]) for i in range(20)]
        df = self._vecs(spark, rows)
        models = pq_fit(df, m=2, dim=4, k=2, iters=1, fit_sample_n=None)
        plan = (
            pq_encode(df, models)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # pure map-side projection


class TestIvfPq:
    def _vecs(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def _rows(self, n=40, dim=8):
        return [
            (i, [float(((i + 3) * (d + 5) * 7) % 19 - 9) for d in range(dim)])
            for i in range(n)
        ]

    def test_full_probe_matches_pq_adc_topk(self, spark):
        """With nprobe == nlist every cell is probed, so IVFADC must
        return exactly the unrouted pq_adc_topk ranking."""
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            ivf_pq_topk,
            pq_adc_topk,
            pq_fit,
        )

        df = self._vecs(spark, self._rows())
        models = pq_fit(df, m=2, dim=8, k=3, iters=2, fit_sample_n=None)
        queries = df.filter("vec_id < 3").select(
            df.vec_id.alias("query_id"), "embedding"
        )
        got = sorted(
            map(
                tuple,
                ivf_pq_topk(
                    df, queries, models, k=4, nlist=4, nprobe=4
                ).collect(),
            )
        )
        ref = sorted(
            map(tuple, pq_adc_topk(df, queries, models, k=4).collect())
        )
        assert got == ref

    def test_probe_routing_matches_python_reference(self, spark):
        """nprobe < nlist: candidates restricted to the query's nprobe
        nearest coarse cells (cos desc, cell asc), ADC ranks within."""
        import math

        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            ivf_pq_topk,
            pq_encode,
            pq_fit,
        )

        rows = self._rows()
        df = self._vecs(spark, rows)
        models = pq_fit(df, m=2, dim=8, k=3, iters=2, fit_sample_n=None)
        coarse = [list(v) for _, v in rows[:4]]  # default first-4 seeding
        queries = df.filter("vec_id < 2").select(
            df.vec_id.alias("query_id"), "embedding"
        )
        got = {}
        for r in ivf_pq_topk(
            df, queries, models, k=3, nlist=4, nprobe=2
        ).collect():
            got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
        codes = {
            r["vec_id"]: (r["code_0"], r["code_1"])
            for r in pq_encode(df, models).collect()
        }

        def dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        def cos(a, b):
            return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

        def cell(v):
            scores = [cos(v, c) for c in coarse]
            return scores.index(max(scores))

        vec = dict(rows)
        assign = {vid: cell(v) for vid, v in rows}
        for qid in (0, 1):
            q = vec[qid]
            order = sorted(range(4), key=lambda ci: (-cos(q, coarse[ci]), ci))
            probed = set(order[:2])
            scored = []
            for vid, v in rows:
                if vid == qid or assign[vid] not in probed:
                    continue
                c0, c1 = codes[vid]
                s = dot(q[0:4], models[0][c0]) + dot(q[4:8], models[1][c1])
                scored.append((-s, vid))
            scored.sort()
            expect = [(rk + 1, vid) for rk, (_, vid) in enumerate(scored[:3])]
            assert sorted(got[qid]) == expect, qid

    def test_corpus_side_is_single_narrow_projection(self, spark):
        """The corpus pass (cell routing + m codes) must plan with no
        Exchange and no join on the corpus side — the only Exchange in
        the full plan is the rank window's per-query shuffle plus the
        broadcast of the probe table."""
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            ivf_pq_topk,
            pq_fit,
        )

        df = self._vecs(spark, self._rows())
        models = pq_fit(df, m=2, dim=8, k=3, iters=1, fit_sample_n=None)
        queries = df.filter("vec_id < 2").select(
            df.vec_id.alias("query_id"), "embedding"
        )
        plan = (
            ivf_pq_topk(df, queries, models, k=3, nlist=4, nprobe=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


class TestLshMultiProbe:
    def _corpus(self, spark):
        import hashlib

        # 30 deterministic pseudo-random 8-dim vectors.
        rows = [
            (
                i,
                [
                    float(
                        hashlib.md5(f"{i}:{d}".encode()).digest()[0] - 128
                    )
                    for d in range(8)
                ],
            )
            for i in range(30)
        ]
        return rows, spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_probes_zero_is_original_search(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.similarity import lsh_topk

        _, df = self._corpus(spark)
        q = df.filter("vec_id < 4").select(
            df.vec_id.alias("query_id"), "embedding"
        )
        a = sorted(
            map(tuple, lsh_topk(df, q, k=3, dim=8, bits=4).collect())
        )
        b = sorted(
            map(
                tuple,
                lsh_topk(df, q, k=3, dim=8, bits=4, probes=0).collect(),
            )
        )
        assert a == b

    def test_probed_candidates_match_python_reference(self, spark):
        """probes=p searches the home bucket plus the p least-|margin|
        single-bit flips; candidate set per query must equal the python
        replay of buckets/margins/flips, and results stay top-k-by-cosine
        within that candidate set."""
        import math

        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            _hyperplane,
            lsh_topk,
        )

        rows, df = self._corpus(spark)
        bits, dim, p = 4, 8, 2
        planes = [_hyperplane(dim, j) for j in range(bits)]

        def dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        def bucket(v):
            return sum(
                (1 << j) for j in range(bits) if dot(v, planes[j]) > 0
            )

        vec = dict(rows)
        buckets = {i: bucket(v) for i, v in rows}
        got = {}
        for r in lsh_topk(
            df,
            df.filter("vec_id < 4").select(
                df.vec_id.alias("query_id"), "embedding"
            ),
            k=30,
            dim=dim,
            bits=bits,
            probes=p,
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        for qid in range(4):
            qv = vec[qid]
            margs = sorted(
                (abs(dot(qv, planes[j])), 1 << j) for j in range(bits)
            )
            probe_buckets = {buckets[qid]} | {
                buckets[qid] ^ pw for _, pw in margs[:p]
            }
            expect = {
                i
                for i, _ in rows
                if i != qid and buckets[i] in probe_buckets
            }
            assert got.get(qid, set()) == expect, qid

        def cos(a, b):
            return dot(a, b) / (
                math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
            )

        # top-k within candidates: k=1 returns the max-cosine candidate
        one = {
            r["query_id"]: r["vec_id"]
            for r in lsh_topk(
                df,
                df.filter("vec_id < 4").select(
                    df.vec_id.alias("query_id"), "embedding"
                ),
                k=1,
                dim=dim,
                bits=bits,
                probes=p,
            ).collect()
        }
        for qid in range(4):
            cands = got.get(qid, set())
            if not cands:
                assert qid not in one
                continue
            best = min((-cos(vec[qid], vec[i]), i) for i in cands)[1]
            assert one[qid] == best, qid

    def test_multiprobe_recall_monotone(self, spark):
        """More probes can only widen the candidate set."""
        from dbt_gdpr_anonymizer_spark.operators.similarity import lsh_topk

        _, df = self._corpus(spark)
        q = df.filter("vec_id < 4").select(
            df.vec_id.alias("query_id"), "embedding"
        )
        sizes = []
        for p in (0, 1, 3):
            out = lsh_topk(df, q, k=30, dim=8, bits=4, probes=p).collect()
            sizes.append(len(out))
        assert sizes[0] <= sizes[1] <= sizes[2]


class TestPqAssignLayout:
    def test_cell_partitioned_write_prunes_on_read(self, spark, tmp_path):
        """The docstring's scale contract — encode once, write
        partitioned by cell, probe reads touch only probed cells — must
        actually partition-prune: the read plan carries a cell
        PartitionFilter and returns exactly that cell's rows."""
        import re

        from pyspark.sql import functions as F

        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            pq_assign,
            pq_fit,
        )

        rows = [
            (i, [float(((i + 2) * (d + 3) * 11) % 13 - 6) for d in range(8)])
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        models = pq_fit(df, m=2, dim=8, k=3, iters=1, fit_sample_n=None)
        coarse = [list(v) for _, v in rows[:4]]
        corpus = pq_assign(df, models, id_col="vec_id",
                           vec_col="embedding", coarse=coarse)
        by_cell = {}
        for r in corpus.collect():
            by_cell.setdefault(r["cell"], set()).add(r["vec_id"])
        target = max(by_cell, key=lambda c: len(by_cell[c]))
        path = str(tmp_path / "pq_cells")
        corpus.write.partitionBy("cell").parquet(path)
        rd = spark.read.parquet(path).filter(F.col("cell") == target)
        plan = rd._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"PartitionFilters: \[[^\]]*cell", plan), plan
        assert {r["vec_id"] for r in rd.collect()} == by_cell[target]

    def test_ivf_pq_composes_with_kmeans_coarse(self, spark):
        """The documented refined-quantizer composition: coarse from
        kmeans_fit_model routes cells; results stay top-k within the
        probed candidate set (sanity: right shape, ranks 1..k, no
        self-matches)."""
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            ivf_pq_topk,
            kmeans_fit_model,
            pq_fit,
        )

        rows = [
            (i, [float(((i + 5) * (d + 1) * 17) % 23 - 11) for d in range(8)])
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        models = pq_fit(df, m=2, dim=8, k=3, iters=1, fit_sample_n=None)
        coarse = kmeans_fit_model(df, 4, iters=2, fit_sample_n=None)
        out = ivf_pq_topk(
            df,
            df.filter("vec_id < 3").select(
                df.vec_id.alias("query_id"), "embedding"
            ),
            models,
            k=3,
            nlist=4,
            nprobe=2,
            coarse=coarse,
        ).collect()
        assert out, "refined-coarse composition returned nothing"
        for r in out:
            assert 1 <= r["rank"] <= 3 and r["vec_id"] != r["query_id"]


class TestHashingEmbed:
    def _docs(self, spark):
        rows = [
            (1, "the quick brown fox"),
            (2, "THE QUICK!! brown--fox"),  # normalizes to the same tokens
            (3, "hash the hash the hash"),
            (4, ""),  # zero-token doc -> zero vector
            (5, None),  # NULL text -> zero vector
        ]
        return rows, spark.createDataFrame(
            rows, "doc_id long, text string"
        )

    @staticmethod
    def _ref(text, dim, salt="hembed"):
        import hashlib
        import re

        vec = [0] * dim
        n = 0
        norm = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()
        for w in norm.split():
            if not w:
                continue
            h = hashlib.md5(f"{salt}:{w}".encode()).hexdigest()
            b = int(h[:5], 16) % dim
            s = 1 if int(h[5], 16) % 2 == 0 else -1
            vec[b] += s
            n += 1
        return [float(x) for x in vec], n

    def test_matches_python_reference(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            hashing_embed,
        )

        rows, df = self._docs(spark)
        got = {
            r["doc_id"]: (list(r["embedding"]), r["n_tokens"])
            for r in hashing_embed(df, dim=16).collect()
        }
        assert set(got) == {1, 2, 3, 4, 5}
        for doc_id, text in rows:
            assert got[doc_id] == self._ref(text, 16), doc_id
        # identical token streams embed identically
        assert got[1] == got[2]
        # zero-token docs are the zero vector, not missing rows
        assert got[4] == ([0.0] * 16, 0) and got[5] == ([0.0] * 16, 0)

    def test_feeds_the_embedding_tier(self, spark):
        """The glue contract: hashing_embed output drives the ANN/PQ
        tier directly (text -> dense vector -> retrieval)."""
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            cosine_topk,
            hashing_embed,
        )

        docs = spark.createDataFrame(
            [
                (i, f"alpha beta gamma doc{i % 3} " * (i % 4 + 1))
                for i in range(12)
            ],
            "doc_id long, text string",
        )
        emb = hashing_embed(docs, dim=16).filter("n_tokens > 0")
        q = emb.filter("doc_id < 2").select(
            emb.doc_id.alias("query_id"), "embedding"
        )
        out = cosine_topk(
            emb, q, k=3, id_col="doc_id", vec_col="embedding"
        ).collect()
        assert len(out) == 6  # 2 queries x top-3
        # doc 0 and docs 3,6,9 share the exact token multiset ratio ->
        # cosine 1.0 neighbors rank first
        top = [r["doc_id"] for r in out if r["query_id"] == 0][:1]
        assert top and top[0] in (3, 6, 9)

    def test_plan_is_aggregate_only(self, spark):
        """Two keyed hash aggregates + the id join-back: no window, no
        cartesian anywhere in the embed plan."""
        from dbt_gdpr_anonymizer_spark.operators.similarity import (
            hashing_embed,
        )

        _, df = self._docs(spark)
        plan = (
            hashing_embed(df, dim=16)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
