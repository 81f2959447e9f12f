"""Round-3 training-pipeline operators: repetition quality filters (X45),
benchmark decontamination (X46), int8 quantization (X47), and priority
sampling (X48)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.dedup import benchmark_contamination
from dbt_gdpr_anonymizer_spark.operators.quality import repetition_profile
from dbt_gdpr_anonymizer_spark.operators.similarity import quantize_int8
from dbt_gdpr_anonymizer_spark.sources.ingest import priority_sample


def test_repetition_profile_exact_fractions(spark):
    docs = spark.createDataFrame(
        [
            # 6 words, 2 distinct -> dup = 1e6*4//6; bigram "a b" occurs
            # 3 times of 5 -> 1e6*3//5
            (1, "a b a b a b"),
            # all distinct words, all distinct bigrams
            (2, "one two three four"),
            # single word: no bigrams, no duplicates
            (3, "solo"),
            # blank text -> zero words
            (4, "   "),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r for r in repetition_profile(docs).orderBy("doc_id").collect()
    }
    assert rows[1]["n_words"] == 6
    assert rows[1]["dup_word_ppm"] == 1_000_000 * 4 // 6
    assert rows[1]["top_bigram_ppm"] == 1_000_000 * 3 // 5
    assert rows[2]["dup_word_ppm"] == 0
    assert rows[2]["top_bigram_ppm"] == 1_000_000 // 3
    assert rows[3] ["n_words"] == 1
    assert rows[3]["top_bigram_ppm"] == 0
    assert rows[4]["n_words"] == 0
    assert rows[4]["dup_word_ppm"] == 0


def test_benchmark_contamination_flags_overlap_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # benchmark
            (2, "unrelated words entirely different content here"),
            # shares the 5-gram "beta gamma delta epsilon zeta" with doc 1
            (3, "prefix beta gamma delta epsilon zeta suffix"),
            # shares two distinct 5-grams with doc 1
            (4, "alpha beta gamma delta epsilon zeta tail"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(1,)], ["doc_id"])
    got = {
        r["doc_id"]: r["n_shared_grams"]
        for r in benchmark_contamination(docs, bench, n=5).collect()
    }
    assert got == {3: 1, 4: 2}


def test_quantize_int8_bounds_and_reconstruction(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.5, 1.0]), (2, [2.0, 2.0, 2.0]), (3, [-1.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # min -> -128, max -> 127 exactly
    assert rows[1]["q_vec"][0] == -128
    assert rows[1]["q_vec"][2] == 127
    assert rows[1]["q_vec"][1] == math.floor(0.5 * 255.0) - 128
    # constant vector -> all zeros, not NaN/div-by-zero
    assert rows[2]["q_vec"] == [0, 0, 0]
    assert rows[3]["q_vec"] == [-128, 127, math.floor(1.0 * 255.0 / 2.0) - 128]
    # CSV rendering matches the array (cross-engine hash form)
    assert rows[3]["q_csv"] == ",".join(str(v) for v in rows[3]["q_vec"])
    # dequantization error bounded by one step of the per-vector range
    step = (rows[1]["v_max"] - rows[1]["v_min"]) / 255.0
    for orig, q in zip([0.0, 0.5, 1.0], rows[1]["q_vec"]):
        deq = rows[1]["v_min"] + (q + 128) * step
        assert abs(deq - orig) <= step


def test_priority_sample_weighted_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, 1 if i < 900 else 1000) for i in range(1000)], ["k", "w"]
    )
    s1 = priority_sample(df, "w", 100, "k")
    s2 = priority_sample(df, "w", 100, "k")
    ids1 = sorted(r["k"] for r in s1.collect())
    assert ids1 == sorted(r["k"] for r in s2.collect())
    # the 100 heavy rows (w=1000, 10% of rows) should dominate the sample:
    # a heavy row beats a light one unless its uniform is ~1000x larger
    heavy = sum(1 for k in ids1 if k >= 900)
    assert heavy >= 90
    # exact-n, and priorities are u/w
    assert len(ids1) == 100
    row = s1.orderBy("_priority").limit(1).collect()[0]
    assert row["_priority"] >= 0.0


def test_priority_sample_partitioning_independent(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(500)], ["k", "w"])
    a = sorted(r["k"] for r in priority_sample(df, "w", 50, "k").collect())
    b = sorted(
        r["k"]
        for r in priority_sample(df.repartition(7), "w", 50, "k").collect()
    )
    assert a == b


def test_sparse_cosine_topk_identical_docs_rank_first(spark):
    from dbt_gdpr_anonymizer_spark.operators.similarity import (
        sparse_cosine_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (3, "quick brown fox"),  # partial overlap
            (4, "completely unrelated astronomy telescope nebula"),
        ],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame([(1,)], ["doc_id"])
    rows = sparse_cosine_topk(docs, q, k=3).orderBy("rank").collect()
    # the exact duplicate is rank 1 with score_ppm ~1e6
    assert rows[0]["match_doc_id"] == 2
    assert rows[0]["score_ppm"] >= 999_999
    # the partial overlap ranks above the unrelated doc
    assert rows[1]["match_doc_id"] == 3
    # no-shared-term doc never materializes
    assert all(r["match_doc_id"] != 4 for r in rows)
    # query never matches itself
    assert all(r["match_doc_id"] != 1 for r in rows)


def test_leakage_safe_split_duplicates_same_side(spark):
    from dbt_gdpr_anonymizer_spark.sources.ingest import leakage_safe_split

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "Alpha,  beta GAMMA!"),  # same content, different bytes
            (3, "gamma beta alpha"),  # same words, different order
            (4, "something else entirely"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in leakage_safe_split(docs).collect()}
    assert rows[1]["fingerprint"] == rows[2]["fingerprint"] == rows[3]["fingerprint"]
    assert rows[1]["split"] == rows[2]["split"] == rows[3]["split"]
    assert rows[1]["split"] in ("train", "eval")


def test_leakage_safe_split_ratio(spark):
    from dbt_gdpr_anonymizer_spark.sources.ingest import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"unique document number {i} content word{i}") for i in range(1000)],
        ["doc_id", "text"],
    )
    frac = (
        leakage_safe_split(docs, train_pct=90)
        .filter("split = 'train'")
        .count()
        / 1000
    )
    assert 0.85 < frac < 0.95


def test_pack_sequences_budget_and_determinism(spark):
    from dbt_gdpr_anonymizer_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (50 + (i * 37) % 200))) for i in range(300)],
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, max_tokens=1000, bucket_width=64)
    rows = out.collect()
    # every doc assigned exactly once
    assert len(rows) == 300
    # bucket is the length class
    for r in rows:
        assert r["bucket"] == r["n_tokens"] // 64
    # batch token sums stay within budget + one bucket-max doc
    import collections

    sums = collections.Counter()
    for r in rows:
        sums[(r["bucket"], r["batch_id"])] += r["n_tokens"]
    for (bucket, _), s in sums.items():
        assert s <= 1000 + (bucket + 1) * 64
    # deterministic under repartitioning
    a = sorted((r["doc_id"], r["bucket"], r["batch_id"]) for r in rows)
    b = sorted(
        (r["doc_id"], r["bucket"], r["batch_id"])
        for r in pack_sequences(
            docs.repartition(7), max_tokens=1000, bucket_width=64
        ).collect()
    )
    assert a == b


def test_dsir_importance_weights(spark):
    """DSIR: pool docs sharing the target's n-grams must outweigh pool
    docs made of n-grams the target never uses; featureless docs release
    (0, NULL); n_feats = unigrams + bigrams."""
    from pyspark.sql import functions as F

    from dbt_gdpr_anonymizer_spark.operators.quality import (
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "tgt"),
            (1, "alpha beta delta", "tgt"),
            (2, "alpha beta gamma", "pool"),  # looks like the target
            (3, "zzz qqq xxx", "pool"),  # shares nothing with it
            (4, "", "pool"),  # featureless
        ],
        ["doc_id", "text", "split"],
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            docs, F.col("split") == "tgt", n_buckets=64
        ).collect()
    }
    assert len(out) == 5
    # 3 unigrams + 2 bigrams
    assert out[2]["n_feats"] == 5
    assert out[3]["n_feats"] == 5
    assert out[4]["n_feats"] == 0 and out[4]["logw"] is None
    # target-resembling pool doc carries the larger importance weight
    assert out[2]["logw"] > out[3]["logw"]
    # hand check: every feature of doc 3 is absent from the target, so
    # its weight is strictly negative (p_b < q_b for all its buckets)
    assert out[3]["logw"] < 0


def test_dsir_gumbel_topk(spark):
    """Gumbel-top-k DSIR selection: deterministic under repartitioning,
    honors m, never selects featureless docs, and favors target-like
    docs at low temperature."""
    from pyspark.sql import functions as F

    from dbt_gdpr_anonymizer_spark.operators.quality import dsir_gumbel_topk

    rows = [(0, "alpha beta gamma", "tgt"), (1, "alpha beta delta", "tgt")]
    # 20 pool docs like the target, 20 disjoint from it, 1 featureless
    rows += [(10 + i, "alpha beta gamma", "pool") for i in range(20)]
    rows += [(50 + i, "zzz qqq xxx", "pool") for i in range(20)]
    rows += [(99, "", "pool")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "split"])
    tgt = F.col("split") == "tgt"

    sel = dsir_gumbel_topk(docs, tgt, m=10, temperature=0.05, salt="t")
    got = sorted(r["doc_id"] for r in sel.collect())
    assert len(got) == 10
    assert 99 not in got
    # at temperature 0.05 the weight gap dwarfs the Gumbel noise: every
    # selected doc is target-resembling (ids < 50)
    assert all(i < 50 for i in got)
    # deterministic across partitionings
    again = sorted(
        r["doc_id"]
        for r in dsir_gumbel_topk(
            docs.repartition(7), tgt, m=10, temperature=0.05, salt="t"
        ).collect()
    )
    assert got == again
