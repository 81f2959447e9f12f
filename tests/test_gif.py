"""X15e hermetic GIF codec (operators/multimodal): canonical-vector LZW
pinning, KwKwK / code-width-growth / table-full round-trips, container
parse edges, and the real_decoder dispatch."""

from __future__ import annotations

import pytest

from dbt_gdpr_anonymizer_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    gif_decoder,
    make_gif,
    real_decoder,
)

# The famous 35-byte 1x1 white GIF — a published spec vector whose LZW
# stream (clear=4, index 0, EOI=5 at width 3, LSB-first => 0x44 0x01) is
# documented independently of this implementation.
CANONICAL_1X1 = bytes.fromhex(
    "474946383961010001008000"
    "00ffffff000000"
    "2c000000000100010000"
    "0202440100"
    "3b"
)


def test_canonical_vector_decodes():
    assert gif_decoder(CANONICAL_1X1) == [
        1.0, 1.0, 255.0, 255.0, 255.0, 255.0, 255.0, 765.0,
    ]
    assert _gif_lzw_decode(bytes([0x44, 0x01]), 2) == b"\x00"
    # the encoder reproduces the published bytes exactly
    assert _gif_lzw_encode(b"\x00", 2) == bytes([0x44, 0x01])


def test_lzw_round_trip_kwkwk_and_width_growth():
    import random

    rng = random.Random(3)
    cases = [b"", b"\x01\x01\x01", b"\x01\x01\x01\x01\x01\x01"]
    cases += [
        bytes(rng.randrange(0, 1 << m) for _ in range(n))
        for m, n in [(2, 500), (4, 1500), (5, 40), (8, 3000)]
    ]
    for mcs in (2, 4, 5, 8):
        for data in cases:
            if any(b >= (1 << mcs) for b in data):
                continue
            assert _gif_lzw_decode(_gif_lzw_encode(data, mcs), mcs) == data


def test_lzw_table_full_reset_round_trip():
    import random

    rng = random.Random(9)
    data = bytes(rng.randrange(0, 4) for _ in range(30000))
    assert _gif_lzw_decode(_gif_lzw_encode(data, 2), 2) == data


def test_container_round_trip_features():
    pal = [(i * 16, 255 - i * 16, i * 7) for i in range(16)]
    idx = [[(x + y) % 16 for x in range(6)] for y in range(4)]
    feats = gif_decoder(make_gif(idx, pal))
    colors = [pal[i] for row in idx for i in row]
    assert feats == [
        6.0,
        4.0,
        float(sum(c[0] for c in colors)),
        float(sum(c[1] for c in colors)),
        float(sum(c[2] for c in colors)),
        float(max(ch for c in colors for ch in c)),
        float(min(ch for c in colors for ch in c)),
        float(sum(pal[0])),
    ]


def test_extension_blocks_are_skipped():
    body = make_gif([[0, 1], [1, 0]], [(10, 20, 30), (40, 50, 60)])
    # splice a Graphic Control Extension between the GCT and image desc
    img_at = body.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = body[:img_at] + gce + body[img_at:]
    assert gif_decoder(spliced) == gif_decoder(body)


@pytest.mark.parametrize(
    "mutate,err",
    [
        (lambda b: b"XIF8" + b[4:], "not a GIF"),
        (lambda b: b[:6], "not a GIF"),
        (lambda b: b[: b.index(b"\x2c")] + b"\x3b", "no image data"),
    ],
)
def test_malformed_rejected(mutate, err):
    body = make_gif([[0, 1]], [(1, 2, 3), (4, 5, 6)])
    with pytest.raises(ValueError, match=err):
        gif_decoder(mutate(body))


def test_interlace_and_local_table_raise_not_implemented():
    body = bytearray(make_gif([[0, 1]], [(1, 2, 3), (4, 5, 6)]))
    at = bytes(body).index(b"\x2c")
    for flag in (0x40, 0x80):
        b2 = bytearray(body)
        b2[at + 9] |= flag
        with pytest.raises(NotImplementedError):
            gif_decoder(bytes(b2))


def test_real_decoder_dispatches_gif():
    body = make_gif([[0, 1]], [(0, 0, 0), (255, 255, 255)])
    assert real_decoder(body) == gif_decoder(body)
