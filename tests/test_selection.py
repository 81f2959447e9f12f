"""X144/X145/X146 — token-budget selection, per-source quantile
calibration, and per-source n-gram novelty (operators/quality.py)."""

from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.quality import (
    quantile_normalize_scores,
    source_ngram_novelty,
    token_budget_select,
)


def _docs(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


class TestTokenBudgetSelect:
    def test_everything_fits(self, spark):
        df = _docs(
            spark,
            [(1, 10, 5), (2, 10, 5), (3, 5, 5)],
            ["doc_id", "score", "n_tokens"],
        )
        got = token_budget_select(df, 100, score_col="score")
        assert {r.doc_id for r in got.collect()} == {1, 2, 3}

    def test_boundary_stratum_prefix(self, spark):
        # strata: score 9 (5 tokens) fits fully; score 8 has three docs
        # of 4 tokens each and only 6 budget tokens remain — greedy
        # prefix by id keeps doc 2 (cum 4) and stops at doc 4 (cum 8);
        # doc 6 is excluded even though it would fit alone (prefix, not
        # knapsack, semantics). score 1 is past the cutoff entirely.
        df = _docs(
            spark,
            [
                (1, 9, 5),
                (2, 8, 4),
                (4, 8, 4),
                (6, 8, 4),
                (9, 1, 1),
            ],
            ["doc_id", "score", "n_tokens"],
        )
        got = {r.doc_id for r in token_budget_select(df, 11).collect()}
        assert got == {1, 2}

    def test_budget_smaller_than_best_doc(self, spark):
        df = _docs(
            spark, [(1, 9, 50), (2, 8, 1)], ["doc_id", "score", "n_tokens"]
        )
        got = token_budget_select(df, 10).collect()
        assert got == []

    def test_matches_global_cumsum_rule(self, spark):
        # oracle-in-miniature: selection == rows whose cumulative token
        # sum over (score desc, id asc) stays within budget
        rows = [(i, (i * 7) % 5, 1 + (i * 3) % 4) for i in range(40)]
        df = _docs(spark, rows, ["doc_id", "score", "n_tokens"])
        budget = 37
        ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
        cum, expect = 0, set()
        for i, s, t in ordered:
            cum += t
            if cum <= budget:
                expect.add(i)
        got = {r.doc_id for r in token_budget_select(df, budget).collect()}
        assert got == expect


class TestQuantileNormalize:
    def test_ties_share_min_rank(self, spark):
        df = _docs(
            spark,
            [(1, "a", 10), (2, "a", 10), (3, "a", 20), (4, "a", 30)],
            ["doc_id", "source", "score"],
        )
        got = {
            r.doc_id: r.calib_ppm
            for r in quantile_normalize_scores(
                df, score_col="score"
            ).collect()
        }
        # n=4: below counts 0,0,2,3 → ppm 0, 0, 666666, 1000000
        assert got == {1: 0, 2: 0, 3: 666666, 4: 1000000}

    def test_single_row_group_is_zero(self, spark):
        df = _docs(
            spark,
            [(1, "solo", 99), (2, "b", 1), (3, "b", 2)],
            ["doc_id", "source", "score"],
        )
        got = {
            r.doc_id: r.calib_ppm
            for r in quantile_normalize_scores(
                df, score_col="score"
            ).collect()
        }
        assert got == {1: 0, 2: 0, 3: 1000000}

    def test_groups_are_independent(self, spark):
        df = _docs(
            spark,
            [(1, "a", 1), (2, "a", 100), (3, "b", 50), (4, "b", 60)],
            ["doc_id", "source", "score"],
        )
        got = {
            r.doc_id: r.calib_ppm
            for r in quantile_normalize_scores(
                df, score_col="score"
            ).collect()
        }
        assert got == {1: 0, 2: 1000000, 3: 0, 4: 1000000}

    def test_null_group_is_a_normal_partition(self, spark):
        """r9 (the md5_bucketed_rank lesson): the rank window treats a
        NULL group as an ordinary partition; the rank join-back must be
        null-safe or those rows silently vanish."""
        df = _docs(
            spark,
            [(1, None, 1), (2, None, 2), (3, None, 3), (4, "a", 7)],
            ["doc_id", "source", "score"],
        )
        got = {
            r.doc_id: r.calib_ppm
            for r in quantile_normalize_scores(
                df, score_col="score"
            ).collect()
        }
        assert got == {1: 0, 2: 500000, 3: 1000000, 4: 0}


class TestSourceNgramNovelty:
    def test_exclusive_vs_shared(self, spark):
        df = _docs(
            spark,
            [
                # "a b c" shared by both sources; "x y z" exclusive to s1
                (1, "s1", "a b c and x y z"),
                (2, "s2", "a b c only"),
            ],
            ["doc_id", "source", "text"],
        )
        got = {
            r.source: (r.distinct_grams, r.exclusive_grams, r.exclusive_ppm)
            for r in source_ngram_novelty(df, n=3).collect()
        }
        # s1 grams: "a b c","b c and","c and x","and x y","x y z" (5,
        # 4 exclusive); s2 grams: "a b c","b c only" (2, 1 exclusive)
        assert got["s1"] == (5, 4, 800000)
        assert got["s2"] == (2, 1, 500000)

    def test_short_docs_contribute_nothing(self, spark):
        df = _docs(
            spark,
            [(1, "s1", "one two"), (2, "s2", "a b c")],
            ["doc_id", "source", "text"],
        )
        got = {
            r.source: r.distinct_grams
            for r in source_ngram_novelty(df, n=3).collect()
        }
        assert got == {"s2": 1}

    def test_within_source_duplicates_counted_once(self, spark):
        df = _docs(
            spark,
            [(1, "s1", "a b c"), (2, "s1", "a b c")],
            ["doc_id", "source", "text"],
        )
        row = source_ngram_novelty(df, n=3).collect()[0]
        assert (row.distinct_grams, row.exclusive_grams) == (1, 1)


class TestSourceDupReport:
    def test_intra_vs_cross(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            source_dup_report,
        )

        df = spark.createDataFrame(
            [
                # s1 re-crawls itself: docs 1,2 identical (intra)
                (1, "s1", "alpha beta gamma"),
                (2, "s1", "alpha beta gamma"),
                # s2 mirrors s1's content (cross for both)
                (3, "s2", "alpha beta gamma"),
                # unique docs
                (4, "s1", "delta epsilon zeta"),
                (5, "s2", "eta theta iota"),
            ],
            ["doc_id", "source", "text"],
        )
        got = {
            r.source: (
                r.n_docs,
                r.dup_docs,
                r.intra_dup_docs,
                r.cross_dup_docs,
                r.dup_ppm,
            )
            for r in source_dup_report(df).collect()
        }
        # s1: 3 docs; 2 dup (both intra AND cross); ppm = 2e6 div 3
        assert got["s1"] == (3, 2, 2, 2, 666666)
        # s2: 2 docs; 1 dup, cross only
        assert got["s2"] == (2, 1, 0, 1, 500000)

    def test_no_duplicates(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            source_dup_report,
        )

        df = spark.createDataFrame(
            [(1, "s1", "a b"), (2, "s1", "c d")],
            ["doc_id", "source", "text"],
        )
        row = source_dup_report(df).collect()[0]
        assert (row.dup_docs, row.intra_dup_docs, row.cross_dup_docs) == (
            0,
            0,
            0,
        )

    def test_word_order_insensitive_fingerprint(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            source_dup_report,
        )

        df = spark.createDataFrame(
            [(1, "s1", "beta alpha"), (2, "s2", "alpha  beta!")],
            ["doc_id", "source", "text"],
        )
        got = {
            r.source: r.cross_dup_docs
            for r in source_dup_report(df).collect()
        }
        assert got == {"s1": 1, "s2": 1}


class TestTrainingShardPlan:
    def test_deterministic_and_complete(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.packing import (
            training_shard_plan,
        )

        df = spark.createDataFrame(
            [(i, "x") for i in range(100)], ["doc_id", "text"]
        )
        a = sorted(map(tuple, training_shard_plan(df, 4).collect()))
        b = sorted(map(tuple, training_shard_plan(df, 4).collect()))
        assert a == b  # reproducible permutation
        assert len(a) == 100
        shards = {r[1] for r in a}
        assert shards <= set(range(4)) and len(shards) == 4
        # positions within each shard are 1..|shard| with no gaps
        from collections import defaultdict

        per = defaultdict(list)
        for _id, sh, pos in a:
            per[sh].append(pos)
        for sh, ps in per.items():
            assert sorted(ps) == list(range(1, len(ps) + 1))

    def test_salt_reshuffles(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.packing import (
            training_shard_plan,
        )

        df = spark.createDataFrame(
            [(i, "x") for i in range(50)], ["doc_id", "text"]
        )
        a = {r.doc_id: (r.shard, r.pos) for r in
             training_shard_plan(df, 4).collect()}
        b = {r.doc_id: (r.shard, r.pos) for r in
             training_shard_plan(df, 4, salt="other").collect()}
        assert a != b

    def test_n_shards_one(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.packing import (
            training_shard_plan,
        )

        df = spark.createDataFrame(
            [(i, "x") for i in range(10)], ["doc_id", "text"]
        )
        rows = training_shard_plan(df, 1).collect()
        assert {r.shard for r in rows} == {0}
        assert sorted(r.pos for r in rows) == list(range(1, 11))

    def test_rejects_zero_shards(self, spark):
        import pytest
        from dbt_gdpr_anonymizer_spark.operators.packing import (
            training_shard_plan,
        )

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            training_shard_plan(df, 0)


class TestSemanticDecontaminate:
    def _df(self, spark, rows, idc):
        return spark.createDataFrame(rows, [idc, "embedding"])

    def test_flags_only_eps_close(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            semantic_decontaminate,
        )

        corpus = self._df(
            spark,
            [
                (1, [1.0, 0.0, 0.0]),
                (2, [0.99, 0.14, 0.0]),  # near bench 10 (cos ~0.99)
                (3, [0.0, 1.0, 0.0]),
            ],
            "vec_id",
        )
        bench = self._df(spark, [(10, [1.0, 0.0, 0.0])], "bench_id")
        got = {
            r.vec_id: (r.bench_id, r.cos_sim_ppm)
            for r in semantic_decontaminate(
                corpus, bench, eps_ppm=950_000
            ).collect()
        }
        assert set(got) == {1, 2}
        assert got[1] == (10, 999999) or got[1] == (10, 1000000)
        assert got[2][0] == 10 and got[2][1] >= 950_000

    def test_argmax_tie_prefers_lowest_bench_id(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            semantic_decontaminate,
        )

        corpus = self._df(spark, [(1, [1.0, 0.0])], "vec_id")
        bench = self._df(
            spark, [(7, [1.0, 0.0]), (3, [1.0, 0.0])], "bench_id"
        )
        row = semantic_decontaminate(
            corpus, bench, eps_ppm=900_000
        ).collect()[0]
        assert row.bench_id == 3

    def test_empty_when_nothing_close(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            semantic_decontaminate,
        )

        corpus = self._df(spark, [(1, [1.0, 0.0])], "vec_id")
        bench = self._df(spark, [(9, [0.0, 1.0])], "bench_id")
        assert (
            semantic_decontaminate(corpus, bench, eps_ppm=500_000).count()
            == 0
        )


class TestNeardupAgainstIndex:
    def test_drops_index_hits_and_delta_dups(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            minhash_band_table,
            neardup_against_index,
        )

        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            ["doc_id", "text"],
        )
        idx = minhash_band_table(corpus)
        delta = spark.createDataFrame(
            [
                # identical to ingested doc 1 → all buckets hit → drop
                (10, "the quick brown fox jumps over the lazy dog"),
                # fresh content, duplicated within the delta → 11 wins
                (11, "entirely new content about spark plans"),
                (12, "entirely new content about spark plans"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id for r in
               neardup_against_index(delta, idx).collect()}
        assert got == {11}

    def test_survivor_bucket_count(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            minhash_band_table,
            neardup_against_index,
        )

        idx = minhash_band_table(
            spark.createDataFrame([(1, "aaa bbb ccc")], ["doc_id", "text"])
        )
        delta = spark.createDataFrame(
            [(5, "xxx yyy zzz www")], ["doc_id", "text"]
        )
        rows = neardup_against_index(delta, idx).collect()
        assert [(r.doc_id, r.n_buckets) for r in rows] == [(5, 4)]

    def test_band_table_is_md5_portable(self, spark):
        import hashlib
        from dbt_gdpr_anonymizer_spark.operators.dedup import (
            minhash_band_table,
        )

        df = spark.createDataFrame([(1, "aa bb cc")], ["doc_id", "text"])
        rows = {r.band: r.bucket
                for r in minhash_band_table(df).collect()}
        # replay band 0 by hand: shingle set = {"aa bb cc"} (one 3-gram)
        sh = "aa bb cc"
        h = [hashlib.md5(f"{i}:{sh}".encode()).hexdigest()
             for i in range(8)]
        b0 = hashlib.md5(f"{h[0]}|{h[1]}".encode()).hexdigest()
        assert rows[0] == b0


class TestTokenBudgetByGroup:
    def test_per_group_independence_and_dict_budgets(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            token_budget_select_by_group,
        )

        df = spark.createDataFrame(
            [
                (1, "a", 9, 5),
                (2, "a", 8, 5),  # a: budget 7 → only doc 1
                (3, "b", 1, 5),
                (4, "b", 1, 5),  # b: budget 10, tie stratum, both fit
                (5, "c", 9, 1),  # c: absent from dict → excluded
            ],
            ["doc_id", "source", "score", "n_tokens"],
        )
        got = {
            r.doc_id
            for r in token_budget_select_by_group(
                df, {"a": 7, "b": 10}, score_col="score"
            ).collect()
        }
        assert got == {1, 3, 4}

    def test_boundary_prefix_within_group(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            token_budget_select_by_group,
        )

        df = spark.createDataFrame(
            [
                (1, "a", 5, 4),
                (2, "a", 5, 4),
                (3, "a", 5, 4),  # budget 8 → ids 1,2 (prefix by id)
                (9, "b", 5, 4),  # other group unaffected
            ],
            ["doc_id", "source", "score", "n_tokens"],
        )
        got = {
            r.doc_id
            for r in token_budget_select_by_group(
                df, 8, score_col="score"
            ).collect()
        }
        assert got == {1, 2, 9}

    def test_int_budget_applies_to_all_groups(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            token_budget_select_by_group,
        )

        df = spark.createDataFrame(
            [(1, "a", 2, 3), (2, "b", 2, 3)],
            ["doc_id", "source", "score", "n_tokens"],
        )
        assert (
            token_budget_select_by_group(df, 3, score_col="score").count()
            == 2
        )

    def test_null_group_gets_its_budget(self, spark):
        """r9: a NULL group is a legitimate histogram stratum; the cutoff
        join-back must be null-safe or its rows silently vanish."""
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            token_budget_select_by_group,
        )

        df = spark.createDataFrame(
            [
                (1, None, 9, 5),
                (2, None, 8, 5),  # NULL group: budget 7 → only doc 1
                (3, "a", 9, 5),
            ],
            ["doc_id", "source", "score", "n_tokens"],
        )
        got = {
            r.doc_id
            for r in token_budget_select_by_group(
                df, {None: 7, "a": 10}, score_col="score"
            ).collect()
        }
        assert got == {1, 3}


class TestGateAgreement:
    def test_histogram_cells(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            gate_agreement,
        )

        docs = spark.createDataFrame(
            [
                # 25 distinct words → len_ok (20..80), dup_ok, bigram_ok
                (1, " ".join(f"w{i}" for i in range(25))),
                # 5 words → len fails; bigram ppm = 1e6//4 = 250000
                # also fails (tiny docs exceed the rate gate by
                # construction); dup passes
                (2, "a b c d e"),
                # 30 words all "x" → len ok, dup+bigram fail
                (3, " ".join(["x"] * 30)),
            ],
            ["doc_id", "text"],
        )
        got = {
            (r.len_ok, r.dup_ok, r.bigram_ok): (r.n_docs, r.words_sum)
            for r in gate_agreement(docs).collect()
        }
        assert got[(True, True, True)] == (1, 25)
        assert got[(False, True, False)] == (1, 5)
        assert got[(True, False, False)] == (1, 30)
        assert len(got) == 3

    def test_marginals_recoverable(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            gate_agreement,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(f"t{j+i}" for j in range(30))) for i in range(6)],
            ["doc_id", "text"],
        )
        rows = gate_agreement(docs).collect()
        assert sum(r.n_docs for r in rows) == 6


def test_quantile_normalize_null_scores_excluded(spark):
    """NULL scores are excluded explicitly (no rank without a score) —
    and their absence must not perturb the non-null ranks."""
    from dbt_gdpr_anonymizer_spark.operators.quality import (
        quantile_normalize_scores,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "a", 20)],
        "doc_id long, source string, score long",
    )
    got = {
        r.doc_id: r.calib_ppm
        for r in quantile_normalize_scores(df, score_col="score").collect()
    }
    assert got == {1: 0, 3: 1000000}


class TestTokenBudgetAllTiesGuard:
    """r8: a degenerate all-ties corpus (constant scorer) makes the
    boundary stratum the WHOLE corpus — past max_boundary_rows the
    cumulative sum must route through the range-bucketed two-pass
    scheme, with output identical to the global-window formulation."""

    def test_bucketed_path_matches_global(self, spark):
        rows = [(i, 7, 1 + (i * 3) % 4) for i in range(300)]
        df = _docs(spark, rows, ["doc_id", "score", "n_tokens"])
        budget = 190
        ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
        cum, expect = 0, set()
        for i, s, t in ordered:
            cum += t
            if cum <= budget:
                expect.add(i)
        # force the guarded path (threshold far below the stratum size)
        got_df = token_budget_select(df, budget, max_boundary_rows=10)
        got = {r.doc_id for r in got_df.collect()}
        assert got == expect
        # and the guarded plan must contain no unpartitioned Window
        from tests.conftest import unpartitioned_windows

        assert unpartitioned_windows(got_df) == []

    def test_default_path_unchanged(self, spark):
        rows = [(i, 7, 2) for i in range(20)]
        df = _docs(spark, rows, ["doc_id", "score", "n_tokens"])
        got = {
            r.doc_id for r in token_budget_select(df, 10).collect()
        }
        assert got == {0, 1, 2, 3, 4}


class TestByGroupNonNullableScore:
    def test_all_fit_group_with_non_nullable_score(self, spark):
        """A group whose strata all fit carries cutoff=None; with a
        NON-nullable score column (lit/count-derived) the broadcast
        cutoff row construction previously failed on nullability."""
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            token_budget_select_by_group,
        )

        df = _docs(
            spark,
            [(1, "a", 3), (2, "a", 3), (3, "b", 3)],
            ["doc_id", "source", "n_tokens"],
        ).withColumn("score", F.lit(5))  # non-nullable by construction
        assert not df.schema["score"].nullable
        got = {
            r.doc_id
            for r in token_budget_select_by_group(
                df.select("doc_id", "source", "score", "n_tokens"),
                100,
            ).collect()
        }
        assert got == {1, 2, 3}


class TestDistinctiveTerms:
    def test_planted_distinctive_word_ranks_first(self, spark):
        """A word appearing ONLY in group 'a' (and often) must outrank
        the shared background vocabulary for 'a'; exact y_gw counts and
        the rank tie-break are pinned structurally (the z numerics are
        pinned by the DuckDB oracle at sf0.001/0.01/0.1)."""
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            distinctive_terms,
        )

        shared = "alpha beta gamma delta epsilon"
        rows = [(i, "a", f"{shared} zebra zebra zebra") for i in range(6)]
        rows += [(100 + i, "b", shared) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = distinctive_terms(
            df, group_col="lang", text_col="text", top_k=3,
            min_corpus_count=5,
        ).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["lang"], []).append(r)
        a = sorted(by_g["a"], key=lambda r: r["rank"])
        assert a[0]["word"] == "zebra" and a[0]["y_gw"] == 18
        assert [r["rank"] for r in a] == [1, 2, 3]
        # zebra is maximally ANTI-distinctive for b: absent from its top-k
        assert all(r["word"] != "zebra" for r in by_g["b"])
        # z released as floor-scaled BIGINT, ordered within each group
        for g in by_g.values():
            zs = [r["z_e4"] for r in sorted(g, key=lambda r: r["rank"])]
            assert zs == sorted(zs, reverse=True)

    def test_min_corpus_count_excludes_rare_words(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            distinctive_terms,
        )

        rows = [(1, "a", "common common common common common rare")]
        rows += [(2, "b", "common common common common common")]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = distinctive_terms(
            df, group_col="lang", text_col="text", top_k=5,
            min_corpus_count=5,
        ).collect()
        assert all(r["word"] != "rare" for r in out)

    def test_null_group_is_first_class(self, spark):
        """r9 ADVICE: the group-total join-back must be null-safe — a
        NULL group is a real stratum (unlabelled source), not a row to
        silently drop. Its distinctive word must come back scored and
        ranked under group NULL, and the labelled groups' counts must be
        unaffected by its presence."""
        from dbt_gdpr_anonymizer_spark.operators.quality import (
            distinctive_terms,
        )

        shared = "alpha beta gamma delta epsilon"
        rows = [(i, "a", f"{shared} zebra zebra zebra") for i in range(6)]
        rows += [(100 + i, None, f"{shared} quux quux quux") for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = distinctive_terms(
            df, group_col="lang", text_col="text", top_k=2,
            min_corpus_count=5,
        ).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["lang"], []).append(r)
        assert None in by_g, "NULL group silently dropped by the join-back"
        null_top = min(by_g[None], key=lambda r: r["rank"])
        assert null_top["word"] == "quux" and null_top["y_gw"] == 18
        a_top = min(by_g["a"], key=lambda r: r["rank"])
        assert a_top["word"] == "zebra" and a_top["y_gw"] == 18
