"""Unit tests for operators/privacy.py (l-diversity, t-closeness, DP noisy
counts) and the exact edit-distance near-dup (operators/dedup.py)."""

from __future__ import annotations

import hashlib
import math

import pytest

from dbt_gdpr_anonymizer_spark.operators.dedup import edit_distance_pairs
from dbt_gdpr_anonymizer_spark.operators.privacy import (
    dp_noisy_counts,
    geometric_noise_thresholds,
    l_diversity_violations,
    t_closeness_report,
)


@pytest.fixture(scope="module")
def people(spark):
    # QI = (zip, age_band); sensitive = condition. Group ("75", "a") is
    # 3-anonymous but 1-diverse (everyone shares "flu").
    rows = [
        ("75", "a", "flu"),
        ("75", "a", "flu"),
        ("75", "a", "flu"),
        ("75", "b", "flu"),
        ("75", "b", "cold"),
        ("69", "a", "cold"),
        ("69", "a", "flu"),
        ("69", "a", "ulcer"),
    ]
    return spark.createDataFrame(rows, ["zip", "age_band", "condition"])


def test_l_diversity_flags_homogeneous_groups(people):
    out = l_diversity_violations(people, ["zip", "age_band"], "condition", l=2)
    rows = [(r.zip, r.age_band, r.distinct_sensitive) for r in out.collect()]
    assert rows == [("75", "a", 1)]

    out3 = l_diversity_violations(people, ["zip", "age_band"], "condition", l=3)
    got = {(r.zip, r.age_band): r.distinct_sensitive for r in out3.collect()}
    assert got == {("75", "a"): 1, ("75", "b"): 2}


def test_t_closeness_exact_tvd(people):
    out = t_closeness_report(people, ["zip", "age_band"], "condition")
    got = {
        (r.zip, r.age_band): (r.group_size, r.t_distance_ppm) for r in out.collect()
    }
    # global: flu 5/8, cold 2/8, ulcer 1/8; released as exact TVD ppm
    # ("75","a"): p=(1,0,0)    TVD = ½(|1-5/8| + 2/8 + 1/8) = 0.375
    # ("75","b"): p=(½,½,0)    TVD = ½(1/8 + 2/8 + 1/8) = 0.25
    # ("69","a"): p=(⅓,⅓,⅓)    TVD = 7/24 → floor(1e6·7/24) = 291666
    assert got[("75", "a")] == (3, 375000)
    assert got[("75", "b")] == (2, 250000)
    assert got[("69", "a")] == (3, 291666)


def test_geometric_thresholds_monotone_and_complete():
    th = geometric_noise_thresholds(1.0, 8)
    assert len(th) == 16
    assert th == sorted(th)
    assert 0 < th[0] and th[-1] < 2**52
    # symmetric distribution: the middle cut (P(noise <= -1)) mirrors
    # 1 - P(noise <= 0)
    p_le_m1 = th[7] / 2**52
    p_le_0 = th[8] / 2**52
    assert abs(p_le_m1 - (1 - p_le_0)) < 1e-12


def _expected_noise(key: str, epsilon: float = 1.0, bound: int = 8) -> int:
    th = geometric_noise_thresholds(epsilon, bound)
    h = int(hashlib.md5(key.encode()).hexdigest()[:13], 16)
    return -bound + sum(1 for t in th if h >= t)


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    rows = [(f"g{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["g"])
    a = {(r.g): r.noisy_count for r in dp_noisy_counts(df, ["g"]).collect()}
    b = {(r.g): r.noisy_count for r in dp_noisy_counts(df, ["g"]).collect()}
    assert a == b  # reproducible release
    true = {f"g{i}": (200 + 6 - i) // 7 for i in range(7)}
    for g, noisy in a.items():
        exp = max(0, true[g] + _expected_noise(f"{g}\x1fdp_salt"))
        assert noisy == exp
        assert abs(noisy - true[g]) <= 8  # truncated noise is bounded

    # a different salt redraws the noise (same mechanism, fresh release)
    c = {r.g: r.noisy_count for r in dp_noisy_counts(df, ["g"], salt="other").collect()}
    assert any(c[g] != a[g] for g in c) or all(
        _expected_noise(f"{g}\x1fother") == _expected_noise(f"{g}\x1fdp_salt")
        for g in c
    )


def test_dp_noise_distribution_roughly_centered():
    # inverse-CDF sanity over many keys: mean ≈ 0, spread ≈ discrete Laplace
    noises = [_expected_noise(f"key-{i}\x1fdp_salt") for i in range(2000)]
    mean = sum(noises) / len(noises)
    assert abs(mean) < 0.2
    var = sum(n * n for n in noises) / len(noises)
    a = math.exp(-1.0)
    expected_var = 2 * a / (1 - a) ** 2
    assert 0.5 * expected_var < var < 1.7 * expected_var


@pytest.fixture(scope="module")
def edit_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz under heavy september rain in the old town square"
    )
    rows = [
        (1, base),
        (2, base.replace("quick", "quack", 1)),  # distance 1 (i→a)
        (3, base + " again"),  # distance 6 (appended)
        (4, "completely unrelated content about database query planners"),
        (5, "abcdefgh"),  # short pair sharing NO 3-gram, distance 8
        (6, "ijklmnop"),
        (7, base.replace("the", "xxx")),  # many edits, > 8
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_edit_distance_pairs_exact(edit_docs):
    out = edit_distance_pairs(edit_docs, "text", "doc_id", max_distance=8)
    got = {(r.doc_id_a, r.doc_id_b): r.edit_distance for r in out.collect()}
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 6
    assert got[(2, 3)] == 7
    # short-doc branch: no shared gram, still found (distance exactly 8)
    assert got[(5, 6)] == 8
    assert (1, 7) not in got  # beyond threshold
    assert (1, 4) not in got
    assert all(d <= 8 for d in got.values())


def test_edit_distance_repeated_grams_df_window(spark):
    """Pins the r12 df-count-window rewrite: document frequency now comes
    from count() over (partition by _h) instead of a groupBy+back-join.
    Docs built so the same 3-gram repeats WITHIN a doc (occ numbering
    must split them into distinct tokens) and ACROSS docs (df > 1 must
    push those grams to the END of the rarest-first prefix order) — a
    wrong df or a lost occurrence would drop the (1,2) pair or admit
    (1,3) past verification."""
    shared = "abcabcabcabcabcabcabcabcabc"  # 'abc' repeats: occ 1..9
    rows = [
        (1, shared + "xyzuvw"),
        (2, shared + "xyzuvq"),  # distance 1 from doc 1
        (3, "qrstqrstqrstqrstqrstqrstqrs"),  # no overlap, far away
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = edit_distance_pairs(df, "text", "doc_id", max_distance=2)
    got = {(r.doc_id_a, r.doc_id_b): r.edit_distance for r in out.collect()}
    assert got == {(1, 2): 1}


def test_edit_distance_zero_threshold_finds_exact_dups(spark):
    df = spark.createDataFrame(
        [(1, "hello world one"), (2, "hello world one"), (3, "hello world two")],
        ["doc_id", "text"],
    )
    out = edit_distance_pairs(df, "text", "doc_id", max_distance=0)
    got = [(r.doc_id_a, r.doc_id_b, r.edit_distance) for r in out.collect()]
    assert got == [(1, 2, 0)]


def test_generalize_to_k_picks_finest_sufficient_level(spark):
    """k=2 over a crafted table: width-10 bands leave a singleton cell, so
    the ladder must land on width 100 where every cell holds >= 2 rows."""
    from dbt_gdpr_anonymizer_spark.operators.privacy import generalize_to_k

    rows = (
        [("A", 5.0), ("A", 7.0), ("A", 15.0), ("A", 17.0)]  # 10-bands ok
        + [("B", 25.0), ("B", 35.0)]  # 10-bands: two singleton cells
    )
    df = spark.createDataFrame(rows, ["seg", "bal"])
    out = generalize_to_k(df, "seg", "bal", 2, widths=(10, 100))
    got = {(r["seg"], r["band_label"]): r["n"] for r in out.collect()}
    assert all(r["level"] == 1 for r in out.collect())
    assert got == {("A", "100:0"): 4, ("B", "100:0"): 2}


def test_generalize_to_k_scans_corpus_once(spark, tmp_path):
    """Single-scan contract: the chosen level's output is derived from the
    persisted grouping-sets aggregate, so the source parquet appears in
    the final physical plan at most once (inside the cached subplan) —
    NOT re-aggregated for the output. A second source scan at 100 TB
    would double the dominant cost of the operator."""
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.privacy import generalize_to_k

    src = str(tmp_path / "gk.parquet")
    spark.createDataFrame(
        [("A", 5.0), ("A", 7.0), ("B", 25.0), ("B", 35.0)], ["seg", "bal"]
    ).write.parquet(src)
    df = spark.read.parquet(src)
    out = generalize_to_k(df, "seg", "bal", 2, widths=(10, 100))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("gk.parquet") <= 1, (
        "generalize_to_k output plan re-scans the corpus:\n" + plan
    )
    # and the suppression branch ('*') re-reduces cached cells, same rule
    df2 = spark.read.parquet(src)
    out2 = generalize_to_k(df2, "seg", "bal", 5, widths=(10,))
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("gk.parquet") <= 1
    release_caches(out)
    release_caches(out2)


def test_generalize_to_k_suppresses_when_no_level_suffices(spark):
    from dbt_gdpr_anonymizer_spark.operators.privacy import generalize_to_k

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 5000.0), ("B", 2.0)], ["seg", "bal"]
    )
    out = generalize_to_k(df, "seg", "bal", 2, widths=(10, 100)).collect()
    # segment B has one row at every width -> full suppression
    assert {r["band_label"] for r in out} == {"*"}
    assert {(r["seg"], r["n"]) for r in out} == {("A", 2), ("B", 1)}
    assert all(r["level"] == 2 for r in out)


def test_dp_noisy_sum_clips_and_is_deterministic(spark):
    from dbt_gdpr_anonymizer_spark.operators.privacy import dp_noisy_sum

    # user 1 contributes 50+60=110 -> clipped to 100; user 2 contributes 30
    df = spark.createDataFrame(
        [("g", 1, 50), ("g", 1, 60), ("g", 2, 30)],
        "grp string, uid long, v long",
    )
    kw = dict(clip=100, epsilon=1.0, bound=4, salt="s")
    r1 = dp_noisy_sum(df, ["grp"], "uid", "v", **kw).collect()
    r2 = dp_noisy_sum(df, ["grp"], "uid", "v", **kw).collect()
    assert r1 == r2  # deterministic release
    (row,) = r1
    # true clipped sum 130; noise is k*clip for k in [-4, 4], floored at 0
    assert row.noisy_sum % 100 == 30 or row.noisy_sum == 0
    assert 0 <= row.noisy_sum <= 130 + 4 * 100


def test_dp_noisy_sum_floor_at_zero(spark):
    from dbt_gdpr_anonymizer_spark.operators.privacy import dp_noisy_sum
    from dbt_gdpr_anonymizer_spark.operators.privacy import (
        geometric_noise_thresholds,
        uniform52,
    )
    from pyspark.sql import functions as F

    # find a salt whose noise draw is negative for this group key so the
    # floor branch is actually exercised
    df = spark.createDataFrame([("g", 1, 5)], "grp string, uid long, v long")
    for salt in ("a", "b", "c", "d", "e", "f"):
        thresholds = geometric_noise_thresholds(1.0, 4)
        h = spark.createDataFrame([("g",)], "grp string").select(
            uniform52(F.concat_ws("\x1f", F.col("grp"), F.lit(salt))).alias("h")
        ).collect()[0].h
        noise = -4 + sum(1 for t in thresholds if h >= t)
        if noise < 0:
            (row,) = dp_noisy_sum(
                df, ["grp"], "uid", "v", clip=100, epsilon=1.0, bound=4, salt=salt
            ).collect()
            assert row.noisy_sum == 0  # 5 + noise*100 < 0 -> floored
            return
    raise AssertionError("no salt produced negative noise (p < 1e-3)")


def test_microaggregate_blocks_and_remainder(spark):
    from dbt_gdpr_anonymizer_spark.operators.privacy import microaggregate

    # 7 rows, k=3: blocks [0,1,2], [3,4,5,6] (remainder merges into last)
    rows = [("g", i, v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70])]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out = microaggregate(df, ["grp"], "v", 3, id_col="id").collect()
    assert len(out) == 7
    by_block = {}
    for r in out:
        by_block.setdefault(r.block, []).append(r)
    assert sorted(by_block) == [0, 1]
    assert len(by_block[0]) == 3 and len(by_block[1]) == 4
    # centroids: (10+20+30)//3 = 20; (40+50+60+70)//4 = 55
    assert {r.microagg_value for r in by_block[0]} == {20}
    assert {r.microagg_value for r in by_block[1]} == {55}
    assert all(r.n_members == len(by_block[r.block]) for r in out)


def test_microaggregate_suppresses_below_k(spark):
    from dbt_gdpr_anonymizer_spark.operators.privacy import microaggregate

    df = spark.createDataFrame(
        [("big", i, i * 10) for i in range(4)] + [("small", 99, 5)],
        "grp string, id long, v long",
    )
    out = microaggregate(df, ["grp"], "v", 3, id_col="id").collect()
    assert {r.grp for r in out} == {"big"}  # 1-row partition suppressed
    assert len(out) == 4


def test_microaggregate_negative_centroid_truncates_toward_zero(spark):
    from dbt_gdpr_anonymizer_spark.operators.privacy import microaggregate

    # sum = -7 over 2 members: Spark div and DuckDB // both give -3
    df = spark.createDataFrame(
        [("g", 1, -3), ("g", 2, -4)], "grp string, id long, v long"
    )
    out = microaggregate(df, ["grp"], "v", 2, id_col="id").collect()
    assert {r.microagg_value for r in out} == {-3}


def test_microaggregate_properties(spark):
    """Property sweep: every block ≥ k; per-block centroid equals the
    truncated block mean; block sums are preserved up to truncation."""
    from dbt_gdpr_anonymizer_spark.operators.privacy import microaggregate
    import itertools

    vals = [7, -3, 12, 12, 0, 5, 99, -8, 41, 3, 3, 18, 27]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    for k in (2, 3, 5):
        out = microaggregate(df, ["grp"], "v", k, id_col="id").collect()
        assert len(out) == len(vals)
        by_block = {}
        for r in out:
            by_block.setdefault(r.block, []).append(r)
        ordered = sorted(vals)
        for blk, members in sorted(by_block.items()):
            assert len(members) >= k
            ids = {r.id for r in members}
            true_vals = sorted(vals[i] for i in ids)
            # value-adjacent: members are a contiguous slice of the order
            lo = ordered.index(true_vals[0])
            assert any(
                ordered[j:j + len(true_vals)] == true_vals
                for j in range(lo, len(ordered) - len(true_vals) + 1)
            )
            # python int() truncates toward zero like Spark div
            s = sum(true_vals)
            assert {r.microagg_value for r in members} == {int(s / len(true_vals))}


def test_dp_quantile_integer_mechanism(spark):
    """DP median via the power-of-two exponential mechanism: lands on (or
    adjacent to) the true median bin under ε=2ln2 concentration, is
    deterministic under a fixed salt, and moves with the quantile."""
    from dbt_gdpr_anonymizer_spark.operators.privacy import dp_quantile

    rows = [("a", float(v)) for v in range(1000)] + [
        ("b", float(v)) for v in range(500, 900)
    ]
    df = spark.createDataFrame(rows, ["seg", "val"])
    med = {
        r["seg"]: r["dp_quantile_edge"]
        for r in dp_quantile(
            df, "seg", "val", lo=0, hi=1000, width=50
        ).collect()
    }
    # true medians 500 / 700; the mechanism's mass is overwhelmingly on
    # the exact-rank bin, spilling at most one bin either side
    assert abs(med["a"] - 500) <= 50 and abs(med["b"] - 700) <= 50
    again = {
        r["seg"]: r["dp_quantile_edge"]
        for r in dp_quantile(
            df, "seg", "val", lo=0, hi=1000, width=50
        ).collect()
    }
    assert med == again  # deterministic md5 state, no RNG
    p90 = {
        r["seg"]: r["dp_quantile_edge"]
        for r in dp_quantile(
            df, "seg", "val", q_num=9, q_den=10, lo=0, hi=1000, width=50
        ).collect()
    }
    assert p90["a"] > med["a"] and p90["b"] > med["b"]
    # out-of-domain values clamp instead of crashing or leaking range
    df2 = spark.createDataFrame(
        [("c", -1e9), ("c", 1e9), ("c", 500.0)], ["seg", "val"]
    )
    got = dp_quantile(df2, "seg", "val", lo=0, hi=1000, width=100).collect()
    assert len(got) == 1 and 100 <= got[0]["dp_quantile_edge"] <= 1000


def test_anonymization_utility_report(spark):
    """X158: discernibility = sum of squared class sizes, ppm mean class
    size is integral, suppression mass counts below-k rows/classes."""
    from dbt_gdpr_anonymizer_spark.operators.privacy import (
        anonymization_utility_report,
    )

    rows = (
        [("a", "x")] * 6      # class of 6 (>= k)
        + [("a", "y")] * 3    # class of 3 (< k: suppressed)
        + [("b", "x")] * 1    # class of 1 (< k: suppressed)
    )
    df = spark.createDataFrame(rows, ["seg", "nat"])
    r = anonymization_utility_report(df, ["seg", "nat"], k=5).collect()[0]
    assert r.n_rows == 10 and r.n_classes == 3
    assert r.avg_class_size_ppm == (10 * 1_000_000) // 3
    assert r.discernibility == 36 + 9 + 1
    assert r.suppressed_rows == 4 and r.under_k_classes == 2


def test_dp_budget_ledger_prefix_admission(spark):
    """X159: running per-dataset epsilon total; once the budget is
    crossed every later release refuses, even one that would fit."""
    from dbt_gdpr_anonymizer_spark.operators.privacy import dp_budget_ledger

    rel = spark.createDataFrame(
        [
            ("d1", 1, 600_000),
            ("d1", 2, 500_000),  # crosses 1.0 → refused
            ("d1", 3, 100_000),  # would fit alone → still refused (prefix)
            ("d2", 1, 900_000),  # independent dataset
        ],
        ["dataset", "seq", "epsilon_micro"],
    )
    got = {
        (r.dataset, r.seq): (r.cum_eps_micro, r.admitted)
        for r in dp_budget_ledger(rel, 1_000_000).collect()
    }
    assert got[("d1", 1)] == (600_000, True)
    assert got[("d1", 2)] == (1_100_000, False)
    assert got[("d1", 3)] == (1_200_000, False)
    assert got[("d2", 1)] == (900_000, True)
