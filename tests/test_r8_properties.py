"""Property tests for the r8 operators: snapshot_merge (dbt timestamp
strategy) against a pure-Python SCD2 reference over arbitrary multi-run
update schedules, and global_row_number's numbering invariants under
duplicates/negatives/gaps.

Example counts are small because every example runs real Spark jobs (the
test_masking_properties precedent)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# a batch maps key -> (updated_at int, status); dict keys give the
# per-run uniqueness contract for free
_batch = st.dictionaries(
    st.integers(min_value=0, max_value=4),
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0,
    max_size=4,
)


def _ref_scd2(batches):
    """Driver-side reference: dbt timestamp-strategy semantics — strictly
    newer updated_at closes the open version and opens a new one;
    equal/older no-ops; absent keys untouched."""
    state: dict = {}
    for batch in batches:
        for k, (upd, status) in batch.items():
            vs = state.get(k)
            if vs is None:  # new key inserts in any run
                state[k] = [[status, upd, None]]
            else:
                cur = vs[-1]
                if cur[2] is None and upd > cur[1]:
                    cur[2] = upd
                    vs.append([status, upd, None])
    rows = []
    for k, vs in state.items():
        for status, vf, vt in vs:
            rows.append((k, status, vf, vt))
    return sorted(rows)


@given(st.lists(_batch, min_size=1, max_size=3))
@settings(max_examples=8, deadline=None)
def test_snapshot_merge_matches_reference(spark, batches):
    from dbt_gdpr_anonymizer_spark.operators.relational import (
        snapshot_merge,
    )

    snap = None
    for batch in batches:
        if not batch:
            continue
        src = spark.createDataFrame(
            [(k, upd, status) for k, (upd, status) in batch.items()],
            "k long, upd long, status string",
        )
        snap = snapshot_merge(
            snap, src, key="k", updated_col="upd", attr_cols=["status"]
        )
    if snap is None:
        return
    got = sorted(
        (r.k, r.status, r.valid_from, r.valid_to) for r in snap.collect()
    )
    assert got == _ref_scd2([b for b in batches if b])


@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None)
def test_global_row_number_invariants(spark, values):
    """Numbering is a permutation of 1..n; ranks are non-decreasing with
    the value (ties may order arbitrarily WITHIN the tie block, exactly
    like the global window they replace)."""
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.relational import (
        global_row_number,
    )

    df = spark.createDataFrame([(v,) for v in values], "k long")
    out = global_row_number(df, "k", out_col="rn", n_buckets=4)
    rows = [(r["k"], r["rn"]) for r in out.collect()]
    release_caches(out)
    n = len(values)
    assert sorted(rn for _, rn in rows) == list(range(1, n + 1))
    # rank order must agree with value order across distinct values
    by_rank = [k for k, _ in sorted(rows, key=lambda t: t[1])]
    assert by_rank == sorted(by_rank)
