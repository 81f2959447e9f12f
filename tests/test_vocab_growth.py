"""Heaps'-law vocabulary growth curve (operators/vocab.vocab_growth)."""

from __future__ import annotations

import re

from dbt_gdpr_anonymizer_spark.operators.vocab import vocab_growth


def _py_growth(docs, n_buckets):
    """Pure-python replay: docs is [(id, text)] — returns the cumulative
    table keyed by bucket."""
    docs = sorted(docs)
    n = len(docs)
    seen: set[str] = set()
    per_bucket = {}
    for rn, (_id, text) in enumerate(docs, start=1):
        ws = [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split()
            if w
        ]
        b = (rn - 1) * n_buckets // n + 1
        d = per_bucket.setdefault(b, [0, 0, 0])
        d[0] += 1
        d[1] += len(ws)
        d[2] += len(set(ws) - seen)
        seen.update(ws)
    out, dc, tc, vc = {}, 0, 0, 0
    for b in sorted(per_bucket):
        dc += per_bucket[b][0]
        tc += per_bucket[b][1]
        vc += per_bucket[b][2]
        out[b] = (dc, tc, vc)
    return out


def _run(spark, docs, n_buckets=4):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = vocab_growth(df, "doc_id", "text", n_buckets=n_buckets)
    return {
        r.bucket: (r.docs_cum, r.tokens_cum, r.vocab_cum)
        for r in got.collect()
    }


def test_matches_python_replay(spark):
    docs = [
        (1, "the cat sat"),
        (2, "the dog sat"),
        (3, "a cat and a dog"),
        (4, "entirely novel words here"),
        (5, "the the the"),
        (6, "zebra"),
        (7, ""),
        (8, "cat dog zebra novel"),
    ]
    assert _run(spark, docs, 4) == _py_growth(docs, 4)


def test_boilerplate_corpus_vocab_flattens(spark):
    docs = [(i, "same words every time") for i in range(1, 9)]
    got = _run(spark, docs, 4)
    # all 4 distinct words appear in the first doc; the curve is flat
    assert [got[b][2] for b in sorted(got)] == [4, 4, 4, 4]


def test_all_unique_corpus_vocab_tracks_tokens(spark):
    docs = [(i, f"w{i}a w{i}b w{i}c") for i in range(1, 9)]
    got = _run(spark, docs, 4)
    for b in got:
        assert got[b][2] == got[b][1]


def test_fewer_docs_than_buckets(spark):
    docs = [(1, "alpha beta"), (2, "beta gamma")]
    got = _run(spark, docs, 16)
    assert _py_growth(docs, 16) == got


def test_empty_docs_count_as_documents_only(spark):
    docs = [(1, ""), (2, "one token"), (3, "...!!!")]
    got = _run(spark, docs, 1)
    assert got[1] == (3, 2, 2)
