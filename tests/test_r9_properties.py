"""Property tests for the r9 null-safe group-join fixes: every rewritten
groupBy+join-back operator is pinned against its naive single-window /
brute-force reference over arbitrary inputs INCLUDING NULL group keys —
the exact blind spot the r8 ADVICE found in md5_bucketed_rank and the r9
audit found in domain_cap / quantile_normalize_scores /
token_budget_select_by_group.

Example counts are small because every example runs real Spark jobs (the
test_masking_properties precedent)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

# (id, group) rows: ids unique via dict keys; groups drawn from a tiny
# vocabulary INCLUDING None so NULL strata appear in most examples.
_grouped_rows = st.dictionaries(
    st.integers(min_value=0, max_value=40),
    st.sampled_from([None, "a", "b"]),
    min_size=1,
    max_size=14,
)


def _md5_rank_ref(rows):
    """Driver-side reference of row_number() over (partition by grp
    order by md5(cast(id as string)), id) with NULL as a normal group."""
    by_grp: dict = {}
    for i, g in rows.items():
        by_grp.setdefault(g, []).append(i)
    out = {}
    for g, ids in by_grp.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rk, i in enumerate(ids, 1):
            out[(g, i)] = rk
    return out


@given(_grouped_rows)
@settings(max_examples=8, deadline=None)
def test_md5_bucketed_rank_matches_reference_with_null_groups(spark, rows):
    from dbt_gdpr_anonymizer_spark.sources.ingest import md5_bucketed_rank

    df = spark.createDataFrame(
        list(rows.items()), "doc_id long, grp string"
    )
    got = {
        (r["grp"], r["doc_id"]): r["_rk"]
        for r in md5_bucketed_rank(df, ["grp"], "doc_id").collect()
    }
    assert got == _md5_rank_ref(rows)


@given(_grouped_rows, st.integers(min_value=1, max_value=4))
@settings(max_examples=8, deadline=None)
def test_domain_cap_matches_reference_with_null_domains(spark, rows, cap):
    """domain_cap ≡ the naive rank-window formulation: every input row
    gets a verdict, totals are true group sizes, and kept = (rank by id
    within the registered domain) <= cap — NULL domains included."""
    from dbt_gdpr_anonymizer_spark.operators.web import domain_cap

    # url None -> NULL domain; otherwise a URL whose registered domain
    # (last two dot-labels) encodes the group label: sub.{g}site.example
    # -> "{g}site.example".
    data = [
        (i, None if g is None else f"https://sub.{g}site.example/p/{i}")
        for i, g in rows.items()
    ]
    df = spark.createDataFrame(data, "doc_id long, url string")
    got = {r["doc_id"]: r for r in domain_cap(df, "url", cap=cap).collect()}
    assert set(got) == set(rows), "every input row gets a verdict"
    by_grp: dict = {}
    for i, g in rows.items():
        by_grp.setdefault(g, []).append(i)
    for g, ids in by_grp.items():
        ids.sort()
        for rk, i in enumerate(ids, 1):
            r = got[i]
            assert r["domain_total"] == len(ids)
            assert r["kept"] == (rk <= cap), (g, i, rk, cap)


@given(_grouped_rows)
@settings(max_examples=8, deadline=None)
def test_quantile_normalize_matches_percent_rank_with_null_groups(
    spark, rows
):
    """quantile_normalize_scores ≡ floor(percent_rank()*1e6) computed
    driver-side (ties share the min rank), NULL groups included."""
    from dbt_gdpr_anonymizer_spark.operators.quality import (
        quantile_normalize_scores,
    )

    # score = id % 5 so ties occur within groups
    data = [(i, g, i % 5) for i, g in rows.items()]
    df = spark.createDataFrame(data, "doc_id long, source string, score long")
    got = {
        r["doc_id"]: r["calib_ppm"]
        for r in quantile_normalize_scores(df, score_col="score").collect()
    }
    by_grp: dict = {}
    for i, g, s in data:
        by_grp.setdefault(g, []).append((s, i))
    expect = {}
    for g, pairs in by_grp.items():
        n = len(pairs)
        for s, i in pairs:
            below = sum(1 for s2, _ in pairs if s2 < s)
            expect[i] = (below * 1_000_000) // (n - 1) if n > 1 else 0
    assert got == expect


@given(_grouped_rows, st.integers(min_value=0, max_value=30))
@settings(max_examples=8, deadline=None)
def test_token_budget_by_group_matches_bruteforce_with_null_groups(
    spark, rows, budget
):
    """token_budget_select_by_group ≡ per-group greedy (score desc,
    id asc within the boundary stratum), NULL groups included."""
    from dbt_gdpr_anonymizer_spark.operators.quality import (
        token_budget_select_by_group,
    )

    data = [(i, g, i % 4, 1 + i % 3) for i, g in rows.items()]
    df = spark.createDataFrame(
        data, "doc_id long, source string, score long, n_tokens long"
    )
    got = {
        r["doc_id"]
        for r in token_budget_select_by_group(
            df, budget, score_col="score"
        ).collect()
    }
    expect = set()
    by_grp: dict = {}
    for i, g, s, t in data:
        by_grp.setdefault(g, []).append((s, i, t))
    for g, items in by_grp.items():
        # strata strictly above the cutoff all pass; the boundary stratum
        # fills by id order within the remaining budget
        items.sort(key=lambda x: (-x[0], x[1]))
        cum = 0
        # group strata by score to mirror the operator's stratum logic
        strata: dict = {}
        for s, i, t in items:
            strata.setdefault(s, []).append((i, t))
        cutoff, rem, all_fit = None, 0, True
        for s in sorted(strata, reverse=True):
            tot = sum(t for _, t in strata[s])
            if cum + tot <= budget:
                cum += tot
            else:
                cutoff, rem, all_fit = s, budget - cum, False
                break
        for s in sorted(strata, reverse=True):
            if all_fit or s > cutoff:
                expect.update(i for i, _ in strata[s])
            elif s == cutoff:
                c = 0
                for i, t in sorted(strata[s]):
                    c += t
                    if c <= rem:
                        expect.add(i)
                break
            else:
                break
    assert got == expect
