"""operators/dedup: X180 b-bit minwise hashing (Li & König)."""

import hashlib
from itertools import combinations


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _shingles(text, n=3):
    ws = text.split()
    if len(ws) >= n:
        return set(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )
    return {" ".join(ws)}


def _replay(texts, *, num_hashes=16, bands=8, b_bits=4, threshold=0.7):
    r = num_hashes // bands
    nib = b_bits // 4
    sh = {i: _shingles(t) for i, t in texts.items()}
    mins = {
        d: [
            min(_md5(f"{i}:{s}") for s in grams)
            for i in range(num_hashes)
        ]
        for d, grams in sh.items()
    }
    bb = {
        d: "".join(h[32 - nib :] for h in hs) for d, hs in mins.items()
    }
    buckets = {
        d: {
            (b, _md5("|".join(hs[b * r : b * r + r])))
            for b in range(bands)
        }
        for d, hs in mins.items()
    }
    out = {}
    for a, b in combinations(sorted(texts), 2):
        if not (buckets[a] & buckets[b]):
            continue
        j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if j < threshold:
            continue
        m = sum(
            bb[a][i * nib : (i + 1) * nib]
            == bb[b][i * nib : (i + 1) * nib]
            for i in range(num_hashes)
        )
        two_b = 1 << b_bits
        est = (1_000_000 * max(two_b * m - num_hashes, 0)) // (
            num_hashes * (two_b - 1)
        )
        out[(a, b)] = (m, est, int(j * 1_000_000))
    return out


def _run(spark, texts, **kw):
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.dedup import (
        bbit_minhash_pairs,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], ["doc_id", "text"]
    )
    out = bbit_minhash_pairs(df, **kw)
    rows = out.collect()
    release_caches(out)
    return {
        (r.doc_id_a, r.doc_id_b): (
            r.bbit_matches,
            r.bbit_est_ppm,
            r.jaccard_ppm,
        )
        for r in rows
    }


def test_bbit_matches_python_replay(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        1: base,
        2: base + " extra",  # near-dup of 1
        3: base,  # exact dup of 1
        4: "completely different words entirely unrelated content here now",
        5: "completely different words entirely unrelated content here too",
    }
    got = _run(spark, texts, threshold=0.5)
    want = _replay(texts, threshold=0.5)
    assert got == want
    assert (1, 3) in got  # exact dup pair survives


def test_bbit_identical_docs_estimate_full(spark):
    texts = {1: "alpha beta gamma delta epsilon", 2: "alpha beta gamma delta epsilon"}
    got = _run(spark, texts)
    (m, est, j) = got[(1, 2)]
    assert m == 16
    assert est == 1_000_000  # (1e6·(16·16-16)) div (16·15) exactly
    assert j == 1_000_000


def test_bbit_estimate_clamps_at_zero(spark):
    # threshold 0 keeps any banding-candidate pair; docs sharing one
    # shingle can band-collide while most b-bit positions differ, so
    # the raw estimator may go negative — the release must clamp
    texts = {
        1: "shared trigram here plus aaa bbb ccc",
        2: "shared trigram here plus xxx yyy zzz",
    }
    got = _run(spark, texts, threshold=0.0)
    want = _replay(texts, threshold=0.0)
    assert got == want
    for m, est, _ in got.values():
        assert est >= 0
        assert est == (1_000_000 * max(16 * m - 16, 0)) // (16 * 15)


def test_bbit_signature_is_nibble_suffix(spark):
    # b_bits=8 keeps two nibbles per hash; replay must still agree
    texts = {
        1: "one two three four five six seven",
        2: "one two three four five six seven eight",
    }
    got = _run(spark, texts, b_bits=8, threshold=0.5)
    want = _replay(texts, b_bits=8, threshold=0.5)
    assert got == want


def test_bbit_rejects_bad_params(spark):
    import pytest

    from dbt_gdpr_anonymizer_spark.operators.dedup import (
        bbit_minhash_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="divisible"):
        bbit_minhash_pairs(df, num_hashes=10, bands=4)
    with pytest.raises(ValueError, match="multiple of 4"):
        bbit_minhash_pairs(df, b_bits=3)
