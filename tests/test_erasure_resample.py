"""Units for GDPR erasure cascade, temperature resampling, and incremental
dedup — the round-4 corpus-governance additions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.dedup import (
    dedup_against_index,
    exact_dedup,
)
from dbt_gdpr_anonymizer_spark.operators.erasure import (
    erase_keys,
    erasure_matches,
    erasure_survivors,
)
from dbt_gdpr_anonymizer_spark.sources.ingest import temperature_resample


def test_erase_keys_purges_requested_subjects(spark):
    events = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 10), (4, 30)], ["event_id", "user_id"]
    )
    deletion = spark.createDataFrame([(10,), (30,)], ["user_id"])
    kept = erase_keys(events, deletion, "user_id")
    assert sorted(r["event_id"] for r in kept.collect()) == [2]


def test_erasure_contains_is_exact_substring(spark):
    """user3@x must never match user31@x — the term carries its own
    delimiter, so substring containment is identifier-exact."""
    docs = spark.createDataFrame(
        [
            (31, "mail user31@x.fr thanks"),
            (3, "mail user3@x.fr thanks"),
            (7, "mentions user3@x.fr in passing"),
            (8, "clean document"),
        ],
        ["doc_id", "text"],
    )
    banned = spark.createDataFrame([("user3@x.fr",)], ["term"])
    hit = sorted(r["doc_id"] for r in erasure_matches(docs, banned).collect())
    assert hit == [3, 7]  # owner AND the mere mention; 31 untouched
    kept = sorted(r["doc_id"] for r in erasure_survivors(docs, banned).collect())
    assert kept == [8, 31]


def test_erasure_max_terms_guard(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    terms = spark.range(5).select(F.col("id").cast("string").alias("term"))
    with pytest.raises(ValueError):
        erasure_survivors(docs, terms, max_terms=3, overflow="error")
    # explicit opt-out runs on the contains path
    assert erasure_survivors(docs, terms, max_terms=None).count() == 1
    # default overflow behavior: past the cap the token path runs ('x' is
    # not a banned token, so the doc survives)
    assert erasure_survivors(docs, terms, max_terms=3).count() == 1


def test_erasure_token_path_past_cap(spark):
    """Past max_terms the operator switches to the token equi-join:
    delimited-token equality, punctuation trimmed from token ends, and no
    substring false-positives (user3@x.fr vs user31@x.fr)."""
    docs = spark.createDataFrame(
        [
            (3, "mail (user3@x.fr), thanks"),  # punctuation-wrapped match
            (31, "mail user31@x.fr thanks"),  # superstring, must NOT match
            (8, "clean document"),
            (9, None),  # NULL text: never matches, survives
        ],
        ["doc_id", "text"],
    )
    # 20,001 distinct terms — past the default 10^4 cap
    terms = (
        spark.range(20_000)
        .select(F.concat(F.lit("u"), F.col("id").cast("string")).alias("term"))
        .unionByName(spark.createDataFrame([("user3@x.fr",)], ["term"]))
    )
    hit = sorted(r["doc_id"] for r in erasure_matches(docs, terms).collect())
    assert hit == [3]
    kept = sorted(
        r["doc_id"] for r in erasure_survivors(docs, terms).collect()
    )
    assert kept == [8, 9, 31]


def test_erasure_token_path_matches_contains_on_delimited_terms(spark):
    """When every term occurrence is whitespace/punctuation-delimited, the
    token path and the contains path agree exactly (forced via
    max_terms=0 vs max_terms=None on the same inputs)."""
    docs = spark.createDataFrame(
        [
            (1, "owner a@b.fr cc c@d.fr"),
            (2, "owner c@d.fr!"),
            (3, "nothing here"),
        ],
        ["doc_id", "text"],
    )
    terms = spark.createDataFrame([("a@b.fr",), ("c@d.fr",)], ["term"])
    via_tokens = sorted(
        r["doc_id"]
        for r in erasure_survivors(docs, terms, max_terms=0).collect()
    )
    via_contains = sorted(
        r["doc_id"]
        for r in erasure_survivors(docs, terms, max_terms=None).collect()
    )
    assert via_tokens == via_contains == [3]


def test_temperature_resample_quotas_exact(spark):
    """Quotas follow n_target·floor(sqrt(n_g)·2^20) div Σ — verify against
    the same arithmetic computed in Python."""
    rows = [(i, "big") for i in range(900)] + [
        (i + 1000, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_resample(df, "lang", 100, key="doc_id")
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    s_big = math.floor(math.sqrt(900) * (1 << 20))
    s_small = math.floor(math.sqrt(100) * (1 << 20))
    tot = s_big + s_small
    assert got == {"big": 100 * s_big // tot, "small": 100 * s_small // tot}
    # sqrt temperature flattens: big gets 75, not the proportional 90
    assert got["big"] == 75 and got["small"] == 25


def test_temperature_resample_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(60)], ["doc_id", "lang"]
    )
    a = sorted(r["doc_id"] for r in temperature_resample(df, "lang", 20).collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_resample(df.repartition(7), "lang", 20).collect()
    )
    assert a == b  # stable across partitionings


def test_dedup_against_index_only_fresh_survive(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        ["doc_id", "text"],
    )
    delta = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),  # dup of indexed doc 1 -> dropped
            (11, "eta theta iota"),  # fresh
            (12, "eta theta iota"),  # dup WITHIN delta -> min-id wins
        ],
        ["doc_id", "text"],
    )
    index = exact_dedup(corpus).select("fingerprint")
    got = sorted(r["doc_id"] for r in dedup_against_index(delta, index).collect())
    assert got == [11]


def test_corpus_quality_gate_reasons_and_precedence(spark):
    from dbt_gdpr_anonymizer_spark.operators.quality import corpus_quality_gate

    docs = spark.createDataFrame(
        [
            (1, "tiny"),  # < 5 words
            (2, "spam spam spam spam spam spam"),  # dup words AND bigrams
            (3, "a perfectly ordinary sentence about data pipelines"),
            (4, "w@@@ %%% ### !!! ??? &&& *** $$$ ((( )))"),  # punct-heavy
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["keep"], r["reject_reason"])
        for r in corpus_quality_gate(docs).collect()
    }
    assert got[1] == (False, "too_short")
    # dup-word rule outranks the bigram rule in the fixed precedence
    assert got[2] == (False, "dup_words")
    assert got[3] == (True, None)
    assert got[4][0] is False


def test_temperature_resample_alpha_one_is_proportional(spark):
    """sqrt_temperature=False (α=1): quotas stay proportional to group
    size — the integer-lattice arithmetic, without the sqrt flattening."""
    rows = [(i, "big") for i in range(90)] + [(i + 100, "small") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = {
        r["lang"]: r["n"]
        for r in temperature_resample(df, "lang", 50, sqrt_temperature=False)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {"big": 45, "small": 5}


def test_temperature_resample_exact_total_hits_target(spark):
    """exact_total=True: the largest-remainder waterfill lands on exactly
    n_target even when floored quotas undershoot and a small group lacks
    capacity; default mode documents (and shows) the undershoot."""
    rows = (
        [(i, "big") for i in range(903)]
        + [(i + 2000, "mid") for i in range(93)]
        + [(i + 4000, "tiny") for i in range(3)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    # default floors: total ≤ n_target
    base = temperature_resample(df, "lang", 97, key="doc_id").count()
    assert base <= 97
    exact = temperature_resample(
        df, "lang", 97, key="doc_id", exact_total=True
    )
    got = {
        r["lang"]: r["n"]
        for r in exact.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sum(got.values()) == 97
    assert got["tiny"] <= 3  # capped at group size
    # determinism across partitionings
    a = sorted(r["doc_id"] for r in exact.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_resample(
            df.repartition(11), "lang", 97, key="doc_id", exact_total=True
        ).collect()
    )
    assert a == b


def test_temperature_resample_exact_total_caps_at_corpus(spark):
    """n_target beyond the corpus size: every row is drawn, no loop hang."""
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10)], ["doc_id", "lang"]
    )
    assert (
        temperature_resample(df, "lang", 50, exact_total=True).count() == 10
    )


def test_erasure_guard_counts_distinct_terms(spark):
    """A deletion list with duplicate literals must not trip max_terms:
    the cap guards what actually broadcasts (the distinct term set)."""
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    dup_terms = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("b",)], ["term"]
    )
    # 2 distinct terms under a cap of 3 — must run despite 5 raw rows
    assert erasure_survivors(docs, dup_terms, max_terms=3).count() == 1


def test_erasure_small_list_regex_metachars_exact(spark):
    """The r7 chunked-regex filter tier must keep EXACT substring
    semantics for terms full of regex metacharacters."""
    docs = spark.createDataFrame(
        [
            (1, "price is $4.99 (final)"),
            (2, "price is $4X99 (final)"),  # '.' must not match as regex dot
            (3, "a+b=c proof"),
            (4, "aab=c proof"),  # 'a+b' must not match as one-or-more 'a'
            (5, "clean"),
        ],
        ["doc_id", "text"],
    )
    terms = spark.createDataFrame([("$4.99",), ("a+b",)], ["term"])
    hit = sorted(r["doc_id"] for r in erasure_matches(docs, terms).collect())
    assert hit == [1, 3]
    kept = sorted(
        r["doc_id"] for r in erasure_survivors(docs, terms).collect()
    )
    assert kept == [2, 4, 5]


def test_erasure_small_list_null_text_survives_anti(spark):
    """NULL text never matches: dropped by the audit view, kept by the
    survivor view — identical to the join-path semantics."""
    docs = spark.createDataFrame(
        [(1, "has bad@x.fr"), (2, None)], ["doc_id", "text"]
    )
    terms = spark.createDataFrame([("bad@x.fr",)], ["term"])
    assert [r["doc_id"] for r in erasure_matches(docs, terms).collect()] == [1]
    assert [
        r["doc_id"] for r in erasure_survivors(docs, terms).collect()
    ] == [2]


def test_erasure_token_path_trims_terms_like_tokens(spark):
    """r6 ADVICE fix: a term carrying surrounding punctuation previously
    could NEVER match (tokens are trimmed, terms were not). Both sides now
    trim with IDENT_TRIM_RE, meeting at the identifier core — with a
    warning that semantics widened."""
    import warnings as _w

    docs = spark.createDataFrame(
        [(3, "mail user3@x.fr thanks"), (8, "clean")], ["doc_id", "text"]
    )
    terms = spark.createDataFrame([("(user3@x.fr),",)], ["term"])
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        hit = sorted(
            r["doc_id"]
            for r in erasure_matches(docs, terms, max_terms=0).collect()
        )
    assert hit == [3]
    assert any("trimmed identifier core" in str(c.message) for c in caught)


def test_erasure_token_path_phrase_terms_still_match(spark):
    """Multi-word terms cannot equal a single token; the token path routes
    them through the bounded substring fallback instead of silently
    dropping them (r6 ADVICE false-negative fix)."""
    docs = spark.createDataFrame(
        [
            (1, "report about John Smith today"),
            (2, "mail user7@x.fr thanks"),
            (3, "clean"),
            (4, "johnsmith concatenated must not match"),
        ],
        ["doc_id", "text"],
    )
    terms = spark.createDataFrame(
        [("John Smith",), ("user7@x.fr",)], ["term"]
    )
    hit = sorted(
        r["doc_id"]
        for r in erasure_matches(docs, terms, max_terms=0).collect()
    )
    assert hit == [1, 2]
    kept = sorted(
        r["doc_id"]
        for r in erasure_survivors(docs, terms, max_terms=0).collect()
    )
    assert kept == [3, 4]


def test_erasure_token_path_id_col_hot_term(spark):
    """id_col keys phase 2 on row ids: duplicate texts under a hot term
    must each resolve by their own id, and results match the text-keyed
    default."""
    docs = spark.createDataFrame(
        [
            (1, "hot common@x.fr mention"),
            (2, "hot common@x.fr mention"),  # duplicate text, distinct id
            (3, "clean"),
        ],
        ["doc_id", "text"],
    )
    terms = spark.createDataFrame([("common@x.fr",)], ["term"])
    by_id = sorted(
        r["doc_id"]
        for r in erasure_matches(
            docs, terms, id_col="doc_id", max_terms=0
        ).collect()
    )
    by_text = sorted(
        r["doc_id"]
        for r in erasure_matches(docs, terms, max_terms=0).collect()
    )
    assert by_id == by_text == [1, 2]
    assert sorted(
        r["doc_id"]
        for r in erasure_survivors(
            docs, terms, id_col="doc_id", max_terms=0
        ).collect()
    ) == [3]


def test_erasure_token_path_phrase_cap_refuses(spark):
    """>1024 phrase-shaped terms cannot ride the substring fallback — the
    operator refuses loudly instead of degrading to O(rows·terms)."""
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    phrases = spark.range(1100).select(
        F.concat(F.lit("two words "), F.col("id").cast("string")).alias(
            "term"
        )
    )
    with pytest.raises(ValueError, match="substring fallback"):
        erasure_matches(docs, phrases, max_terms=0).collect()


def test_semantic_dedup_planted_paraphrase_pair(spark):
    """SemDeDup: two near-identical embeddings (cos ~0.9999) must resolve
    to the lower id surviving; orthogonal vectors all survive."""
    from dbt_gdpr_anonymizer_spark.operators.dedup import semantic_dedup

    def unit(i, dim=8, bump=0.0):
        v = [0.0] * dim
        v[i] = 1.0
        if bump:
            v[(i + 1) % dim] = bump
        return v

    rows = [
        (0, unit(0)),
        (1, unit(1)),
        (2, unit(2)),
        # 10 is a tiny perturbation of id 0 -> same cluster, cos ~ 0.999
        (10, unit(0, bump=0.05)),
        (11, unit(3)),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    surv = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            df, eps=0.9, k=4, iters=2, fit_sample_n=None
        ).collect()
    )
    assert 10 not in surv  # dominated by the smaller-id near-twin
    assert 0 in surv
    assert set(surv) == {0, 1, 2, 11}
    # with a stricter threshold nothing is close enough to drop
    surv_strict = semantic_dedup(
        df, eps=0.9999, k=4, iters=2, fit_sample_n=None
    ).count()
    assert surv_strict == 5
