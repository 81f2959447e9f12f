"""Blocked Fellegi–Sunter record linkage (operators/linkage.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.linkage import fs_link_pairs


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "b1", "alice smith", "a@x.fr"),
            (2, "b1", "bob jones", "b@x.fr"),
            (3, "b2", "carol white", None),
        ],
        "id bigint, blk string, name string, email string",
    )
    right = spark.createDataFrame(
        [
            (11, "b1", "alice smyth", "a@x.fr"),  # name 1 edit, email eq
            (12, "b1", "robert jones", "zz@x.fr"),  # both disagree
            (13, "b2", "carol white", None),  # name eq, emails NULL
            (14, "b9", "alice smith", "a@x.fr"),  # different block: unseen
        ],
        "id bigint, blk string, name string, email string",
    )
    return left, right


def _tests():
    return {
        "name": F.levenshtein(F.col("a_name"), F.col("b_name")) <= 2,
        "email": F.col("a_email") == F.col("b_email"),
    }


_WEIGHTS = {"name": (2_000_000, -1_000_000), "email": (3_000_000, -500_000)}


def _run(spark, match=4_000_000, possible=500_000):
    left, right = _frames(spark)
    return {
        (r.a_id, r.b_id): r
        for r in fs_link_pairs(
            left,
            right,
            "id",
            ["blk"],
            _tests(),
            _WEIGHTS,
            match_threshold_e6=match,
            possible_threshold_e6=possible,
        ).collect()
    }


def test_scores_and_decisions(spark):
    got = _run(spark)
    # (1, 11): name agrees (1 edit) + email agrees = 5e6 -> match
    assert got[(1, 11)].score_e6 == 5_000_000
    assert got[(1, 11)].decision == "match"
    assert got[(1, 11)].agree_name == 1 and got[(1, 11)].agree_email == 1
    # (3, 13): name agrees, NULL emails = disagreement -> 1.5e6 possible
    assert got[(3, 13)].score_e6 == 1_500_000
    assert got[(3, 13)].decision == "possible"
    assert got[(3, 13)].agree_email == 0


def test_below_possible_threshold_filtered(spark):
    got = _run(spark)
    # (2, 12): name 3+ edits disagree, email disagree -> -1.5e6, dropped
    assert (2, 12) not in got


def test_blocking_prunes_cross_block_pairs(spark):
    got = _run(spark, possible=-10_000_000)
    # id 14 matches id 1 on every field but sits in block b9
    assert all(b != 14 for (_, b) in got)


def test_mismatched_test_weight_names_rejected(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        fs_link_pairs(
            left,
            right,
            "id",
            ["blk"],
            _tests(),
            {"name": (1, -1)},
            match_threshold_e6=1,
            possible_threshold_e6=0,
        )


def test_levenshtein_cross_engine_parity():
    # the comparator this operator leans on must agree between engines
    import duckdb

    cases = [
        ("kitten", "sitting"),
        ("alice smith", "alice smyth"),
        ("bob jones", "robert jones"),
        ("", "abc"),
        ("same", "same"),
    ]
    got_duck = [
        duckdb.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0]
        for a, b in cases
    ]
    want = [3, 1, 4, 3, 0]  # classic DP values, Spark's definition
    assert got_duck == want


def test_levenshtein_spark_matches_reference_values(spark):
    rows = spark.createDataFrame(
        [("kitten", "sitting"), ("alice smith", "alice smyth"),
         ("bob jones", "robert jones"), ("", "abc"), ("same", "same")],
        "a string, b string",
    ).select(F.levenshtein("a", "b").alias("d")).collect()
    assert [r.d for r in rows] == [3, 1, 4, 3, 0]


def test_empty_block_cols_rejected(spark):
    # blocking IS the cartesian guard — an empty block list must fail
    # fast instead of degenerating into an unconditioned join (r10 ADVICE)
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="block_cols"):
        fs_link_pairs(
            left,
            right,
            "id",
            [],
            _tests(),
            _WEIGHTS,
            match_threshold_e6=4_000_000,
            possible_threshold_e6=500_000,
        )
