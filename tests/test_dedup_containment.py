"""X172 directed n-gram containment near-dup pairs."""

import itertools


def _grams(t, n=3):
    ws = t.split()
    if len(ws) >= n:
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
    return {" ".join(ws)}


def _replay(docs, t_ppm, n=3):
    gs = {d: _grams(txt, n) for d, txt in docs}
    out = set()
    for (a, sa), (b, sb) in itertools.permutations(gs.items(), 2):
        c = 1_000_000 * len(sa & sb) // len(sa)
        if c >= t_ppm:
            out.add((a, b, c))
    return out


def test_containment_matches_bruteforce(spark):
    """Asymmetric case: doc 2 is a verbatim quote inside the much longer
    doc 1 — containment(2→1) = 1e6 while Jaccard is far below 0.9; the
    reverse direction must NOT fire."""
    from dbt_gdpr_anonymizer_spark.operators.dedup import containment_pairs
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches

    long_doc = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = [
        (1, long_doc),
        (2, "delta epsilon zeta eta theta"),  # contained in 1
        (3, "completely different words entirely here now"),
        (4, long_doc),  # exact dup of 1: both directions fire
        (5, "one two"),  # short text -> single whole-text gram
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = containment_pairs(df, threshold=0.9)
    got = {(r.id_a, r.id_b, r.containment_ppm) for r in out.collect()}
    release_caches(out)
    want = _replay(docs, 900_000)
    assert got == want
    assert (2, 1, 1_000_000) in got  # quote flagged
    assert not any(a == 1 and b == 2 for a, b, _ in got)  # not reverse
    assert (1, 4, 1_000_000) in got and (4, 1, 1_000_000) in got


def test_containment_prefix_filter_is_lossless(spark):
    """Randomized-ish corpus: the prefix-filtered plan must equal the
    all-pairs replay exactly (full recall at the threshold)."""
    from dbt_gdpr_anonymizer_spark.operators.dedup import containment_pairs
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches

    vocab = "a b c d e f g h i j k l m n o p".split()
    docs = [
        (
            i,
            " ".join(
                vocab[(i * 3 + j * 5) % len(vocab)] for j in range(4 + i % 7)
            ),
        )
        for i in range(24)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for t, t_ppm in [(0.7, 700_000), (0.9, 900_000)]:
        out = containment_pairs(df, threshold=t)
        got = {(r.id_a, r.id_b, r.containment_ppm) for r in out.collect()}
        release_caches(out)
        assert got == _replay(docs, t_ppm), t
