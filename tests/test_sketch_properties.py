"""Hypothesis property tests for the sketch tier (X169-X171): the
Spark operators must equal their pure-python replays on ARBITRARY
generated inputs, not just the handwritten fixtures. One shared Spark
round-trip per example keeps runtime sane (settings below)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# lowercase-alnum token alphabet: already normalized, so the python
# replay's .split() equals the repo tokenizer on these corpora
_token = st.text(alphabet="abcdefghij0123", min_size=1, max_size=5)
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)


@given(corpus=_corpus, depth=st.integers(1, 4), width=st.sampled_from([2, 8, 64]))
@settings(**_SETTINGS)
def test_countmin_property(spark, corpus, depth, width):
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.sketch import (
        countmin_heavy_hitters,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    out = countmin_heavy_hitters(df, depth=depth, width=width, k=1000)
    rows = out.collect()
    release_caches(out)

    counts = Counter(w for t in corpus for w in t.split())
    grid = [Counter() for _ in range(depth)]
    bucket = {}
    for w, c in counts.items():
        for i in range(depth):
            h = hashlib.md5(f"cm{i}:{w}".encode()).hexdigest()
            b = int(h[:5], 16) % width
            bucket[(i, w)] = b
            grid[i][b] += c
    want = {
        w: (c, min(grid[i][bucket[(i, w)]] for i in range(depth)))
        for w, c in counts.items()
    }
    got = {r.token: (r.exact_count, r.cm_estimate) for r in rows}
    assert got == want
    for c, est in got.values():
        assert est >= c


@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", None]), st.integers(0, 400)),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_hll_property(spark, data):
    """Arbitrary (group, value) rows including NULL groups; python
    replay over the identical register derivation must agree exactly
    (including the linear-counting branch and all witnesses)."""
    from dbt_gdpr_anonymizer_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame(
        [(g, f"v{v}") for g, v in data], "grp string, uid string"
    )
    got = {
        r.grp: (
            r.hll_distinct,
            r.n_zero_registers,
            r.register_sum,
            r.register_max,
        )
        for r in hll_distinct(df, ["grp"], "uid").collect()
    }

    m = 256
    alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    groups: dict = {}
    for g, v in data:
        groups.setdefault(g, set()).add(f"v{v}")
    want = {}
    for g, values in groups.items():
        regs: dict = {}
        for v in values:
            h = hashlib.md5(f"hll:{v}".encode()).hexdigest()
            j = int(h[:2], 16)
            bits = bin(int(h[2:15], 16))[2:].zfill(52)
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
        want[g] = (math.floor(e), v0, sum(regs.values()), max(regs.values()))
    assert got == want


@given(
    corpus=st.lists(_doc, min_size=2, max_size=8),
    n_bench=st.integers(1, 2),
    m_bits=st.sampled_from([64, 1024]),
    k=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_bloom_gate_property(spark, corpus, n_bench, m_bits, k):
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.sketch import (
        bloom_contamination_gate,
    )

    docs = list(enumerate(corpus))
    bench_ids = set(range(min(n_bench, len(docs))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(i,) for i in bench_ids], "doc_id long"
    )
    out = bloom_contamination_gate(df, bench, m_bits=m_bits, k=k, n=3)
    got = {
        r.doc_id: (r.n_grams, r.n_bloom_flagged, r.n_exact_matches)
        for r in out.collect()
    }
    release_caches(out)

    def grams(t, n=3):
        ws = [w for w in t.split() if w]
        if len(ws) >= n:
            seen, out_ = set(), []
            for i in range(len(ws) - n + 1):
                g = " ".join(ws[i : i + n])
                if g not in seen:
                    seen.add(g)
                    out_.append(g)
            return out_
        return [" ".join(ws)]

    def positions(g):
        return [
            int(hashlib.md5(f"bloom{i}:{g}".encode()).hexdigest()[:5], 16)
            % m_bits
            for i in range(k)
        ]

    doc_grams = {d: grams(t) for d, t in docs}
    bench_grams = {
        g for d in bench_ids for g in doc_grams[d]
    }
    bits = {p for g in bench_grams for p in positions(g)}
    want = {}
    for d, gs in doc_grams.items():
        if d in bench_ids:
            continue
        flagged = sum(1 for g in gs if all(p in bits for p in positions(g)))
        exact = sum(1 for g in gs if g in bench_grams)
        if flagged:
            want[d] = (len(gs), flagged, exact)
    assert got == want


def test_hll_shard_merge_equals_whole(spark):
    """The 100 TB merge contract: estimating over the UNION of two
    shards' register tables equals estimating the whole frame — and the
    fold re-merges, so the unmerged union is safe."""
    from dbt_gdpr_anonymizer_spark.operators.sketch import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_register_table,
    )

    rows = [("g", f"u{i % 700}") for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    whole = {
        tuple(r)
        for r in hll_distinct(df, ["grp"], "uid").collect()
    }
    half1 = df.filter("uid like 'u1%'")
    half2 = df.filter("uid not like 'u1%'")
    union = hll_register_table(half1, ["grp"], "uid").unionByName(
        hll_register_table(half2, ["grp"], "uid")
    )
    merged = {
        tuple(r)
        for r in hll_estimate_from_registers(union, ["grp"]).collect()
    }
    assert merged == whole


@given(
    data=st.lists(
        st.tuples(st.sampled_from(["p", "q", "r"]), st.integers(0, 120)),
        min_size=2,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_hll_overlap_property(spark, data):
    """Arbitrary (group, value) rows: every pair's four released values
    must equal the register-level python replay."""
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.sketch import hll_set_overlap

    df = spark.createDataFrame(
        [(g, f"v{v}") for g, v in data], "grp string, uid string"
    )
    out = hll_set_overlap(df, "grp", "uid")
    got = {
        (r.group_a, r.group_b): (
            r.hll_a,
            r.hll_b,
            r.hll_union,
            r.hll_intersection,
        )
        for r in out.collect()
    }
    release_caches(out)

    m = 256
    alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    sets: dict = {}
    for g, v in data:
        sets.setdefault(g, set()).add(f"v{v}")

    def regs_of(values):
        regs: dict = {}
        for v in values:
            h = hashlib.md5(f"hll:{v}".encode()).hexdigest()
            j = int(h[:2], 16)
            bits = bin(int(h[2:15], 16))[2:].zfill(52)
            p = bits.find("1")
            regs[j] = max(regs.get(j, 0), 53 if p < 0 else p + 1)
        return regs

    def est(regs):
        s = 0.0
        for jj in range(m):
            s = s + 0.5 ** regs.get(jj, 0)
        v0 = m - len(regs)
        e = alpha_m2 / s
        if e <= 2.5 * m and v0 > 0:
            e = m * math.log(m / v0)
        return math.floor(e)

    names = sorted(sets)
    want = {}
    for i, a in enumerate(names):
        for c in names[i + 1 :]:
            ra, rc = regs_of(sets[a]), regs_of(sets[c])
            ru = {
                j: max(ra.get(j, 0), rc.get(j, 0))
                for j in set(ra) | set(rc)
            }
            ea, ec, eu = est(ra), est(rc), est(ru)
            want[(a, c)] = (ea, ec, eu, ea + ec - eu)
    assert got == want


@given(
    keys_a=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    keys_b=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    width=st.sampled_from([4, 64, 4096]),
    depth=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_cm_join_size_property(spark, keys_a, keys_b, width, depth):
    """Arbitrary key multisets: the estimate equals the replay and
    upper-bounds the exact join size at every width/depth."""
    from dbt_gdpr_anonymizer_spark.operators.sketch import (
        cm_grid_table,
        cm_join_size_estimate,
    )

    a = spark.createDataFrame([(f"k{k}",) for k in keys_a], ["key"])
    b = spark.createDataFrame([(f"k{k}",) for k in keys_b], ["key"])
    ga = cm_grid_table(a, [], "key", depth=depth, width=width)
    gb = cm_grid_table(b, [], "key", depth=depth, width=width)
    (r,) = cm_join_size_estimate(ga, gb, depth=depth).collect()

    ca, cb = Counter(f"k{k}" for k in keys_a), Counter(
        f"k{k}" for k in keys_b
    )
    exact = sum(ca[k] * cb.get(k, 0) for k in ca)
    grids_a = [Counter() for _ in range(depth)]
    grids_b = [Counter() for _ in range(depth)]
    for c, grids in ((ca, grids_a), (cb, grids_b)):
        for k_, n_ in c.items():
            for i in range(depth):
                h = hashlib.md5(f"cm{i}:{k_}".encode()).hexdigest()
                grids[i][int(h[:5], 16) % width] += n_
    want = min(
        sum(grids_a[i][bkt] * grids_b[i][bkt] for bkt in grids_a[i])
        for i in range(depth)
    )
    assert r.cm_join_estimate == want
    assert r.cm_join_estimate >= exact
