"""Min-K% prob membership scores (operators/lm.min_k_prob_scores)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from dbt_gdpr_anonymizer_spark.operators.lm import min_k_prob_scores


def _words(t):
    return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]


def _py_mink(docs, k_pct):
    toks = {i: _words(t) for i, t in docs}
    events = {
        i: [f"{a} {b}" for a, b in zip(ws, ws[1:])] for i, ws in toks.items()
    }
    c12 = Counter(bg for e in events.values() for bg in e)
    c1 = Counter(w for ws in toks.values() for w in ws)
    v = len(c1)
    nll = {
        bg: math.floor(
            -math.log((c + 1.0) / (c1[bg.split(" ")[0]] + v)) * 10000
        )
        for bg, c in c12.items()
    }
    out = {}
    for i, e in events.items():
        n = len(e)
        if n == 0:
            out[i] = (0, 0, None, None)
            continue
        m = max(1, (n * k_pct) // 100)
        top = sorted((nll[bg] for bg in e), reverse=True)[:m]
        s = sum(top)
        out[i] = (n, m, s, s // m)
    return out


def _run(spark, docs, k_pct=20):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = min_k_prob_scores(df, k_pct=k_pct)
    return {
        r.doc_id: (r.n_events, r.m, r.sum_topk_e4, r.mink_mean_e4)
        for r in got.collect()
    }


_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the mat"),  # duplicate: common bigrams, low nll
    (3, "zebra quark flux nebula vortex"),  # all-rare bigrams
    (4, "one"),  # single token: no bigram events
    (5, ""),
    (6, "the cat ate a very small fish near the old mat"),
]


def test_matches_python_replay(spark):
    assert _run(spark, _DOCS, 20) == _py_mink(_DOCS, 20)


def test_rare_doc_scores_higher_than_duplicated_doc(spark):
    got = _run(spark, _DOCS, 20)
    assert got[3][3] > got[1][3]  # memorization signal direction


def test_k100_means_all_events(spark):
    got = _run(spark, _DOCS, 100)
    py = _py_mink(_DOCS, 100)
    assert got == py
    assert all(v[1] == v[0] for v in got.values() if v[0] > 0)


def test_empty_docs_release_nulls(spark):
    got = _run(spark, _DOCS, 20)
    assert got[4] == (0, 0, None, None)
    assert got[5] == (0, 0, None, None)


def test_k_pct_validated(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        min_k_prob_scores(df, k_pct=0)
