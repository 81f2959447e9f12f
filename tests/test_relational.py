"""Tests for as-of join and SCD2 operators."""

from __future__ import annotations

from datetime import datetime

from dbt_gdpr_anonymizer_spark.operators.relational import (
    asof_join,
    scd2_from_changes,
)


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "L1"),
            (1, ts("2024-01-01 12:00:00"), "L2"),
            (2, ts("2024-01-01 09:00:00"), "L3"),  # before any right row
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:30:00"), 100),
            (1, ts("2024-01-01 12:00:00"), 200),  # equal ts -> inclusive
            (2, ts("2024-01-01 11:00:00"), 300),
        ],
        "k long, ts timestamp, v int",
    )
    out = {
        r["tag"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(left, right, "k", right_cols=["v"]).collect()
    }
    assert out["L1"] == (ts("2024-01-01 09:30:00"), 100)
    assert out["L2"] == (ts("2024-01-01 12:00:00"), 200)  # ties match
    assert out["L3"] == (None, None)  # left-join: no earlier right row


def test_asof_join_preserves_null_right_attrs(spark):
    """A right row whose attribute is NULL must still win (the struct
    carry must not skip it for an older non-null row)."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 12:00:00"))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "old"),
            (1, ts("2024-01-01 11:00:00"), None),
        ],
        "k long, ts timestamp, v string",
    )
    [r] = asof_join(left, right, "k", right_cols=["v"]).collect()
    assert r["ts_asof"] == ts("2024-01-01 11:00:00")
    assert r["v_asof"] is None


def test_scd2_compresses_and_versions(spark):
    changes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00"), "bronze"),
            (1, ts("2024-02-01 00:00:00"), "bronze"),  # no-op -> compressed
            (1, ts("2024-03-01 00:00:00"), "gold"),
            (2, ts("2024-01-15 00:00:00"), "silver"),
        ],
        "user_id long, ts timestamp, tier string",
    )
    hist = {
        (r["user_id"], r["tier"]): r
        for r in scd2_from_changes(changes, "user_id", "ts", ["tier"]).collect()
    }
    assert len(hist) == 3  # the no-op change is gone
    b = hist[(1, "bronze")]
    assert b["valid_from"] == ts("2024-01-01 00:00:00")
    assert b["valid_to"] == ts("2024-03-01 00:00:00")
    assert b["is_current"] is False
    g = hist[(1, "gold")]
    assert g["valid_to"] is None and g["is_current"] is True
    assert hist[(2, "silver")]["is_current"] is True


def test_incremental_merge_upsert_semantics(spark):
    """Updates replace same-key rows, new keys append, untouched rows
    survive; schema mismatch is rejected."""
    import pytest

    from dbt_gdpr_anonymizer_spark.operators.relational import (
        incremental_merge,
    )

    existing = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k long, v string"
    )
    out = {
        r["k"]: r["v"]
        for r in incremental_merge(existing, updates, keys=["k"]).collect()
    }
    assert out == {1: "a", 2: "B2", 3: "c", 4: "d"}

    bad = spark.createDataFrame([(1, "x", 0)], "k long, v string, extra int")
    with pytest.raises(ValueError):
        incremental_merge(existing, bad, keys=["k"])


def test_asof_join_deterministic_on_tied_right_rows(spark):
    """Several right rows sharing (key, ts): the field-wise max right row
    must win, identically across runs (the window tiebreaks on the carried
    struct, not on input order)."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 12:00:00"))], "k long, ts timestamp"
    )
    tied = [
        (1, ts("2024-01-01 10:00:00"), v) for v in ("b", "c", "a")
    ]
    for attempt in range(3):
        # vary input row order and partitioning — result must not change
        right = spark.createDataFrame(
            tied[attempt:] + tied[:attempt], "k long, ts timestamp, v string"
        ).repartition(2 + attempt)
        [r] = asof_join(left, right, "k", right_cols=["v"]).collect()
        assert r["v_asof"] == "c"


def test_snapshot_diff_statuses(spark):
    from dbt_gdpr_anonymizer_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, fp string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], "doc_id long, fp string"
    )
    out = {
        r.key: (r.status, r.old_fp, r.new_fp)
        for r in snapshot_diff(old, new, "doc_id", "fp").collect()
    }
    assert out == {
        1: ("removed", "a", None),
        2: ("unchanged", "b", "b"),
        3: ("changed", "c", "C2"),
        4: ("added", None, "d"),
    }


def test_global_row_number_matches_sequential(spark):
    """global_row_number must reproduce row_number() over (order by k)
    exactly on distinct keys — across partitionings and with gaps/
    negative values — while planning NO unpartitioned Window."""
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.relational import (
        global_row_number,
    )

    keys = sorted({(i * 37) % 1009 - 200 for i in range(400)})
    expect = {k: i + 1 for i, k in enumerate(keys)}
    for nparts in (1, 7):
        df = spark.createDataFrame(
            [(k,) for k in keys], "k long"
        ).repartition(nparts)
        out = global_row_number(df, "k", out_col="rn", n_buckets=8)
        got = {r["k"]: r["rn"] for r in out.collect()}
        release_caches(out)
        assert got == expect


def test_global_row_number_plan_has_no_global_window(spark):
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.relational import (
        global_row_number,
    )

    from tests.conftest import unpartitioned_windows

    df = spark.range(1000).withColumnRenamed("id", "k")
    out = global_row_number(df, "k", n_buckets=8)
    hits = unpartitioned_windows(out)
    release_caches(out)
    assert hits == []


def test_global_row_number_empty_input(spark):
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.relational import (
        global_row_number,
    )

    df = spark.range(10).withColumnRenamed("id", "k").filter("k < 0")
    out = global_row_number(df, "k")
    assert out.collect() == []
    release_caches(out)


class TestSnapshotMerge:
    """dbt timestamp-strategy snapshot semantics
    (reference dbt_project.yml:161-173 declares them, ships none)."""

    def _merge(self, snap, src):
        from dbt_gdpr_anonymizer_spark.operators.relational import (
            snapshot_merge,
        )

        return snapshot_merge(
            snap, src, key="k", updated_col="upd",
            attr_cols=["status"],
        )

    def _rows(self, df):
        return sorted(
            (r.k, r.status, r.valid_from, r.valid_to)
            for r in df.collect()
        )

    def test_initial_then_merge(self, spark):
        b1 = spark.createDataFrame(
            [(1, "a", ts("2024-01-01 00:00:00")),
             (2, "b", ts("2024-01-02 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        snap0 = self._merge(None, b1)
        assert self._rows(snap0) == [
            (1, "a", ts("2024-01-01 00:00:00"), None),
            (2, "b", ts("2024-01-02 00:00:00"), None),
        ]
        b2 = spark.createDataFrame(
            [
                (1, "A2", ts("2024-02-01 00:00:00")),  # newer -> new version
                (2, "b", ts("2024-01-02 00:00:00")),   # equal ts -> no-op
                (3, "c", ts("2024-02-03 00:00:00")),   # new key
            ],
            "k long, status string, upd timestamp",
        )
        snap1 = self._merge(snap0, b2)
        assert self._rows(snap1) == [
            (1, "A2", ts("2024-02-01 00:00:00"), None),
            (1, "a", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")),
            (2, "b", ts("2024-01-02 00:00:00"), None),
            (3, "c", ts("2024-02-03 00:00:00"), None),
        ]
        # absent key (2 missing from source) keeps its open version
        b3 = spark.createDataFrame(
            [(1, "A3", ts("2024-03-01 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        snap2 = self._merge(snap1, b3)
        got = self._rows(snap2)
        assert (2, "b", ts("2024-01-02 00:00:00"), None) in got
        assert (1, "A3", ts("2024-03-01 00:00:00"), None) in got
        assert (
            1, "A2", ts("2024-02-01 00:00:00"), ts("2024-03-01 00:00:00")
        ) in got
        assert len(got) == 5

    def test_rerun_same_source_is_idempotent(self, spark):
        b1 = spark.createDataFrame(
            [(1, "a", ts("2024-01-01 00:00:00")),
             (2, "b", ts("2024-01-02 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        snap0 = self._merge(None, b1)
        b2 = spark.createDataFrame(
            [(1, "A2", ts("2024-02-01 00:00:00")),
             (3, "c", ts("2024-02-03 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        once = self._merge(snap0, b2)
        twice = self._merge(once, b2)  # scheduler retry / kill-and-resume
        assert self._rows(once) == self._rows(twice)


class TestSnapshotMergeCheckStrategy:
    """dbt's CHECK strategy (for sources without a reliable updated_at):
    change = any check_col differs null-safely; versions stamp the
    caller-supplied run_ts literal."""

    def _merge(self, spark, snap, rows, run_ts):
        from dbt_gdpr_anonymizer_spark.operators.relational import (
            snapshot_merge,
        )

        src = spark.createDataFrame(rows, "k long, status string")
        return snapshot_merge(
            snap, src, key="k", attr_cols=["status"],
            strategy="check", run_ts=run_ts,
        )

    def test_check_versions_and_noop(self, spark):
        snap0 = self._merge(
            spark, None,
            [(1, "a"), (2, None)], ts("2024-01-01 00:00:00"),
        )
        # NULL attr + unchanged re-send must be a no-op (null-safe
        # compare); changed attr opens a run_ts-stamped version
        snap1 = self._merge(
            spark, snap0,
            [(1, "A2"), (2, None), (3, "c")], ts("2024-02-01 00:00:00"),
        )
        got = sorted(
            (r.k, r.status, r.valid_from, r.valid_to)
            for r in snap1.collect()
        )
        assert got == [
            (1, "A2", ts("2024-02-01 00:00:00"), None),
            (1, "a", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")),
            (2, None, ts("2024-01-01 00:00:00"), None),
            (3, "c", ts("2024-02-01 00:00:00"), None),
        ]
        # idempotence: same source again at a LATER run_ts — all no-ops
        snap2 = self._merge(
            spark, snap1,
            [(1, "A2"), (2, None), (3, "c")], ts("2024-03-01 00:00:00"),
        )
        assert sorted(
            (r.k, r.status, r.valid_from, r.valid_to)
            for r in snap2.collect()
        ) == got

    def test_check_requires_run_ts(self, spark):
        import pytest

        from dbt_gdpr_anonymizer_spark.operators.relational import (
            snapshot_merge,
        )

        src = spark.createDataFrame([(1, "a")], "k long, status string")
        with pytest.raises(ValueError, match="run_ts"):
            snapshot_merge(
                None, src, key="k", attr_cols=["status"], strategy="check"
            )
        with pytest.raises(ValueError, match="updated_col"):
            snapshot_merge(None, src, key="k", attr_cols=["status"])


def test_snapshot_merge_ignores_null_updated_rows(spark):
    """A NULL updated_col source row must be IGNORED (treated as absent),
    not silently delete the key's open version: the strict > under
    three-valued logic would fail all three disjoint arms and the key
    would vanish (r8 review finding)."""
    from dbt_gdpr_anonymizer_spark.operators.relational import (
        snapshot_merge,
    )

    b1 = spark.createDataFrame(
        [(1, "a", ts("2024-01-01 00:00:00"))],
        "k long, status string, upd timestamp",
    )
    snap0 = snapshot_merge(
        None, b1, key="k", updated_col="upd", attr_cols=["status"]
    )
    b2 = spark.createDataFrame(
        [(1, "x", None), (2, "new", None)],
        "k long, status string, upd timestamp",
    )
    snap1 = snapshot_merge(
        snap0, b2, key="k", updated_col="upd", attr_cols=["status"]
    )
    got = sorted(
        (r.k, r.status, r.valid_from, r.valid_to)
        for r in snap1.collect()
    )
    # key 1's open version survives untouched; the NULL-stamped new key
    # does not insert (an unordered change cannot be versioned)
    assert got == [(1, "a", ts("2024-01-01 00:00:00"), None)]


class TestSnapshotMergeHardDeletes:
    """dbt's invalidate_hard_deletes snapshot config: a current version
    whose key is absent from the run's source closes at run_ts; a later
    reappearance inserts a fresh version (r9)."""

    def _merge(self, snap, src, run_ts=None, **kw):
        from dbt_gdpr_anonymizer_spark.operators.relational import (
            snapshot_merge,
        )

        return snapshot_merge(
            snap, src, key="k", updated_col="upd", attr_cols=["status"],
            invalidate_hard_deletes=True, run_ts=run_ts, **kw,
        )

    def _rows(self, df):
        return sorted(
            (r.k, r.status, r.valid_from, r.valid_to)
            for r in df.collect()
        )

    def test_delete_close_and_reappear(self, spark):
        b1 = spark.createDataFrame(
            [(1, "a", ts("2024-01-01 00:00:00")),
             (2, "b", ts("2024-01-02 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        snap0 = self._merge(None, b1, run_ts=ts("2024-01-05 00:00:00"))
        # key 2 vanishes from the source -> closed at run_ts
        b2 = spark.createDataFrame(
            [(1, "a", ts("2024-01-01 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        t2 = ts("2024-02-01 00:00:00")
        snap1 = self._merge(snap0, b2, run_ts=t2)
        assert self._rows(snap1) == [
            (1, "a", ts("2024-01-01 00:00:00"), None),
            (2, "b", ts("2024-01-02 00:00:00"), t2),
        ]
        # idempotent: re-running the same source re-closes nothing
        snap2 = self._merge(snap1, b2, run_ts=ts("2024-03-01 00:00:00"))
        assert self._rows(snap2) == self._rows(snap1)
        # reappearance inserts a fresh open version
        b3 = spark.createDataFrame(
            [(1, "a", ts("2024-01-01 00:00:00")),
             (2, "B2", ts("2024-03-02 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        snap3 = self._merge(snap2, b3, run_ts=ts("2024-04-01 00:00:00"))
        assert self._rows(snap3) == [
            (1, "a", ts("2024-01-01 00:00:00"), None),
            (2, "B2", ts("2024-03-02 00:00:00"), None),
            (2, "b", ts("2024-01-02 00:00:00"), t2),
        ]

    def test_null_stamped_row_is_present_not_deleted(self, spark):
        """A NULL updated_col row cannot be versioned but still counts as
        PRESENT: bad data must not read as a deletion."""
        b1 = spark.createDataFrame(
            [(1, "a", ts("2024-01-01 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        snap0 = self._merge(None, b1, run_ts=ts("2024-01-05 00:00:00"))
        b2 = spark.createDataFrame(
            [(1, "x", None)],
            "k long, status string, upd timestamp",
        )
        snap1 = self._merge(snap0, b2, run_ts=ts("2024-02-01 00:00:00"))
        assert self._rows(snap1) == [
            (1, "a", ts("2024-01-01 00:00:00"), None),
        ]

    def test_requires_run_ts(self, spark):
        import pytest

        from dbt_gdpr_anonymizer_spark.operators.relational import (
            snapshot_merge,
        )

        src = spark.createDataFrame(
            [(1, "a", ts("2024-01-01 00:00:00"))],
            "k long, status string, upd timestamp",
        )
        with pytest.raises(ValueError, match="invalidate_hard_deletes"):
            snapshot_merge(
                None, src, key="k", updated_col="upd",
                attr_cols=["status"], invalidate_hard_deletes=True,
            )

    def test_check_strategy_deletes_too(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.relational import (
            snapshot_merge,
        )

        def merge(snap, rows, run_ts):
            src = spark.createDataFrame(rows, "k long, status string")
            return snapshot_merge(
                snap, src, key="k", attr_cols=["status"],
                strategy="check", run_ts=run_ts,
                invalidate_hard_deletes=True,
            )

        snap0 = merge(None, [(1, "a"), (2, "b")], ts("2024-01-01 00:00:00"))
        t2 = ts("2024-02-01 00:00:00")
        snap1 = merge(snap0, [(1, "a")], t2)
        got = sorted(
            (r.k, r.status, r.valid_from, r.valid_to)
            for r in snap1.collect()
        )
        assert got == [
            (1, "a", ts("2024-01-01 00:00:00"), None),
            (2, "b", ts("2024-01-01 00:00:00"), t2),
        ]


def test_global_row_number_null_keys_match_window_semantics(spark):
    """NULL order keys: approxQuantile ignores them and every comparison
    against a split is NULL -> otherwise(0), so NULLs land in bucket 0
    and order NULLS FIRST within it — exactly the global window's
    ascending NULLS FIRST placement. Pin it."""
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.relational import (
        global_row_number,
    )

    rows = [(None,), (5,), (None,), (1,), (9,)]
    df = spark.createDataFrame(rows, "k long")
    out = global_row_number(df, "k", out_col="rn", n_buckets=4)
    got = sorted(
        ((r["k"], r["rn"]) for r in out.collect()),
        key=lambda t: t[1],
    )
    release_caches(out)
    # two NULLs first (ranks 1-2 in either order), then 1, 5, 9
    assert [k for k, _ in got[:2]] == [None, None]
    assert [k for k, _ in got[2:]] == [1, 5, 9]
    assert [rn for _, rn in got] == [1, 2, 3, 4, 5]


def test_range_bucket_offsets_weighted_totals(spark):
    """weight_col path: _goff must equal the exact sum of preceding
    buckets' weights, so bucket-local cumulative sums + offset equal the
    global running total."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.operators.relational import (
        range_bucket_offsets,
    )

    rows = [(i, (i * 3) % 7 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, w long")
    bo = range_bucket_offsets(df, "k", weight_col="w", n_buckets=4)
    win = Window.partitionBy("_gb").orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    got = {
        r["k"]: r["cum"]
        for r in bo.withColumn(
            "cum", F.sum("w").over(win) + F.col("_goff")
        ).collect()
    }
    release_caches(bo)
    run, expect = 0, {}
    for k, w in sorted(rows):
        run += w
        expect[k] = run
    assert got == expect


class TestGroupQuantilesExact:
    def _ref(self, rows, ps):
        import math

        by_g: dict = {}
        for g, v in rows:
            if v is not None:
                by_g.setdefault(g, []).append(v)
        expect = {}
        for g, vs in by_g.items():
            vs.sort()
            n = len(vs)
            for num, den in ps:
                t = max(math.ceil(num * n / den), 0)
                # smallest value whose cumulative count reaches t
                expect[(g, num, den)] = vs[max(t - 1, 0)]
        return expect

    def test_matches_reference_with_ties_nulls_and_null_group(self, spark):
        from dbt_gdpr_anonymizer_spark.operators.relational import (
            group_quantiles_exact,
        )

        rows = (
            [("a", v) for v in [5, 1, 3, 3, 3, 9, 7]]
            + [("b", 2), ("b", None), ("b", 4)]
            + [(None, 10), (None, 20), (None, 30)]
            + [("empty", None)]
        )
        df = spark.createDataFrame(rows, "g string, v long")
        ps = [(0, 1), (1, 4), (1, 2), (3, 4), (1, 1)]
        got = {
            (r["g"], r["p_num"], r["p_den"]): r["q_value"]
            for r in group_quantiles_exact(df, "g", "v", ps).collect()
        }
        assert got == self._ref(rows, ps)  # 'empty' produces no rows

    def test_rejects_bad_ps(self, spark):
        import pytest

        from dbt_gdpr_anonymizer_spark.operators.relational import (
            group_quantiles_exact,
        )

        df = spark.createDataFrame([("a", 1)], "g string, v long")
        with pytest.raises(ValueError, match="non-empty"):
            group_quantiles_exact(df, "g", "v", [])
        with pytest.raises(ValueError, match="rationals"):
            group_quantiles_exact(df, "g", "v", [(0.5, 1)])
        with pytest.raises(ValueError, match="0 <= num/den"):
            group_quantiles_exact(df, "g", "v", [(3, 2)])

    def test_plan_window_is_group_partitioned(self, spark):
        from tests.conftest import unpartitioned_windows

        from dbt_gdpr_anonymizer_spark.operators.relational import (
            group_quantiles_exact,
        )

        df = spark.createDataFrame(
            [("g", i % 7) for i in range(50)], "g string, v long"
        )
        assert unpartitioned_windows(
            group_quantiles_exact(df, "g", "v", [(1, 2)])
        ) == []


def test_range_bucket_offsets_rejects_fractional_weights(spark):
    """r9 (ADVICE r8): the broadcast prefix sum is exact integer
    arithmetic (int(run)); a double weight_col would silently truncate
    the offsets, so it must fail fast instead."""
    import pytest

    from dbt_gdpr_anonymizer_spark.operators.relational import (
        range_bucket_offsets,
    )

    df = spark.createDataFrame(
        [(i, i * 0.5) for i in range(10)], "k long, w double"
    )
    with pytest.raises(ValueError, match="integral"):
        range_bucket_offsets(df, "k", weight_col="w", n_buckets=2)
