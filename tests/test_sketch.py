"""operators/sketch: X169 count-min heavy hitters, X170 deterministic HLL."""

import hashlib
import math
from collections import Counter


def _cm_replay(texts, depth, width, salt="cm"):
    """Pure-python count-min replay using the repo's tokenizer contract
    (lowercased alnum words — replicated via the Spark words() output in
    the test corpus, which is already normalized)."""
    counts = Counter(w for t in texts for w in t.split())
    grid = [Counter() for _ in range(depth)]
    buckets = {}
    for w, c in counts.items():
        for i in range(depth):
            h = hashlib.md5(f"{salt}{i}:{w}".encode()).hexdigest()
            b = int(h[:5], 16) % width
            buckets[(i, w)] = b
            grid[i][b] += c
    est = {
        w: min(grid[i][buckets[(i, w)]] for i in range(depth))
        for w in counts
    }
    return counts, est


def test_countmin_matches_python_replay(spark):
    """Tiny width forces collisions; estimates must equal the replay and
    always upper-bound the exact count."""
    from dbt_gdpr_anonymizer_spark.operators.sketch import (
        countmin_heavy_hitters,
    )
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches

    texts = [
        "apple banana apple cherry",
        "banana apple date egg fig",
        "apple grape banana cherry cherry",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = countmin_heavy_hitters(df, depth=3, width=4, k=100)
    rows = out.collect()
    release_caches(out)
    counts, est = _cm_replay(texts, depth=3, width=4)
    assert len(rows) == len(counts)
    for r in rows:
        assert r.exact_count == counts[r.token], r.token
        assert r.cm_estimate == est[r.token], r.token
        assert r.cm_estimate >= r.exact_count  # one-sided error
    # release order: (estimate desc, token)
    keys = [(-r.cm_estimate, r.token) for r in rows]
    assert keys == sorted(keys)


def test_countmin_topk_limit(spark):
    from dbt_gdpr_anonymizer_spark.operators.sketch import (
        countmin_heavy_hitters,
    )
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches

    df = spark.createDataFrame(
        [(1, "a a a b b c d e f g")], ["doc_id", "text"]
    )
    out = countmin_heavy_hitters(df, depth=4, width=256, k=2)
    rows = out.collect()
    release_caches(out)
    assert len(rows) == 2
    assert rows[0].token == "a" and rows[0].exact_count == 3
    # width 256 over 7 tokens: collisions vanishingly unlikely with
    # these fixed hashes — estimate equals exact here
    assert rows[0].cm_estimate == 3


def _hll_replay(groups, b=8, salt="hll"):
    m = 1 << b
    alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    out = {}
    for g, values in groups.items():
        regs = {}
        for v in values:
            h = hashlib.md5(f"{salt}:{v}".encode()).hexdigest()
            j = int(h[: b // 4], 16)
            w52 = int(h[b // 4 : b // 4 + 13], 16)
            bits = bin(w52)[2:].zfill(52)
            p = bits.find("1")
            rho = 53 if p < 0 else p + 1
            regs[j] = max(regs.get(j, 0), rho)
        s = 0.0
        for jj in range(m):
            s = s + 0.5 ** regs.get(jj, 0)
        v0 = m - len(regs)
        e = alpha_m2 / s
        if e <= 2.5 * m and v0 > 0:
            e = m * math.log(m / v0)
        out[g] = (
            math.floor(e),
            v0,
            sum(regs.values()),
            max(regs.values()) if regs else None,
        )
    return out


def test_hll_matches_python_replay(spark):
    from dbt_gdpr_anonymizer_spark.operators.sketch import hll_distinct

    data = []
    groups = {"a": [f"u{i}" for i in range(40)], "b": [f"v{i}" for i in range(700)]}
    for g, vs in groups.items():
        for v in vs:
            data.append((g, v))
            data.append((g, v))  # duplicates must not move anything
    df = spark.createDataFrame(data, ["grp", "uid"])
    rows = {
        r.grp: (
            r.hll_distinct,
            r.n_zero_registers,
            r.register_sum,
            r.register_max,
        )
        for r in hll_distinct(df, ["grp"], "uid").collect()
    }
    assert rows == _hll_replay(groups)


def test_hll_accuracy_and_correction_branches(spark):
    """Small group routes through linear counting (V>0, E<=2.5m); the
    estimate should land within ~3 sigma (rsd = 1.04/sqrt(256) ≈ 6.5%)."""
    from dbt_gdpr_anonymizer_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame(
        [("g", f"user-{i}") for i in range(2000)], ["grp", "uid"]
    )
    (r,) = hll_distinct(df, ["grp"], "uid").collect()
    assert abs(r.hll_distinct - 2000) < 2000 * 0.2
    # 2000 >> m=256: every register should be hit — raw branch
    assert r.n_zero_registers == 0

    df2 = spark.createDataFrame(
        [("g", f"user-{i}") for i in range(30)], ["grp", "uid"]
    )
    (r2,) = hll_distinct(df2, ["grp"], "uid").collect()
    assert r2.n_zero_registers > 0  # linear-counting branch
    assert abs(r2.hll_distinct - 30) <= 10


def test_hll_rejects_bad_b(spark):
    import pytest

    from dbt_gdpr_anonymizer_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame([("g", "u")], ["grp", "uid"])
    with pytest.raises(ValueError):
        hll_distinct(df, ["grp"], "uid", b=6)
    with pytest.raises(ValueError):
        hll_distinct(df, ["grp"], "uid", b=4)
