"""Hermetic baseline TIFF tier (operators/multimodal.make_tiff_gray8 /
tiff_decoder)."""

from __future__ import annotations

import pytest

from dbt_gdpr_anonymizer_spark.operators.multimodal import (
    make_tiff_gray8,
    real_decoder,
    tiff_decoder,
)


def _grid(w, h, f=lambda x, y: (x * 11 + y * 37) % 256):
    return [[f(x, y) for x in range(w)] for y in range(h)]


def _feats(pixels, n_strips=1, rps=None):
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    flat = [v for row in pixels for v in row]
    return [
        float(w), float(h), float(sum(flat)),
        float(max(flat, default=0)), float(min(flat, default=0)),
        float(pixels[0][0] if flat else 0),
        float(n_strips), float(h if rps is None else rps),
    ]


def test_roundtrip_single_strip():
    px = _grid(5, 4)
    assert tiff_decoder(make_tiff_gray8(px)) == _feats(px)


def test_roundtrip_multi_strip_external_arrays():
    # rows_per_strip=2 over 5 rows -> 3 strips; StripOffsets/ByteCounts
    # spill to external LONG arrays (count*4 > 4 bytes)
    px = _grid(6, 5)
    got = tiff_decoder(make_tiff_gray8(px, rows_per_strip=2))
    assert got == _feats(px, n_strips=3, rps=2)


def test_big_endian_mm_parses_identically():
    px = _grid(4, 3)
    le = tiff_decoder(make_tiff_gray8(px))
    be = tiff_decoder(make_tiff_gray8(px, big_endian=True))
    assert le == be


def test_real_decoder_dispatches_tiff():
    px = _grid(3, 3)
    assert real_decoder(make_tiff_gray8(px)) == _feats(px)
    assert real_decoder(make_tiff_gray8(px, big_endian=True)) == _feats(px)


def test_compressed_profile_refuses_with_named_swap_in():
    import struct

    px = _grid(3, 3)
    buf = bytearray(make_tiff_gray8(px))
    # patch the Compression tag (259) value to 5 (LZW)
    (ifd_off,) = struct.unpack("<I", bytes(buf[4:8]))
    (n,) = struct.unpack("<H", bytes(buf[ifd_off : ifd_off + 2]))
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack("<H", bytes(buf[base : base + 2]))
        if tag == 259:
            buf[base + 8 : base + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError, match="Pillow"):
        tiff_decoder(bytes(buf))


def test_not_a_tiff_rejected():
    with pytest.raises(ValueError):
        tiff_decoder(b"NOPE....")
    with pytest.raises(ValueError):
        tiff_decoder(b"II\x2b\x00\x08\x00\x00\x00")  # BigTIFF magic 43
