"""operators/sft: chat-transcript parse, per-turn view, and the
array-side validation/stats projection (X137)."""

import pytest

ROWS = [
    (1, '[{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]'),
    (2, '[{"role":"system","content":"s"},{"role":"user","content":"a"},'
        '{"role":"assistant","content":"b"}]'),
    (3, '[{"role":"user","content":"a"},{"role":"user","content":"b"}]'),
    (4, "not json"),
    (5, "[]"),
    (6, None),
    (7, '[{"role":"assistant","content":"x"}]'),
    (8, '[{"role":"system","content":"s"}]'),
]


@pytest.fixture()
def convs(spark):
    return spark.createDataFrame(ROWS, ["conv_id", "transcript"])


def test_chat_stats_survives_caller_column_collisions(spark):
    """r9 ADVICE: the bound intermediate projection used select("*") with
    internal aliases _p/_roles — a caller frame already carrying those
    names raised an ambiguous-column AnalysisException. The bound frame
    now projects only (id_col, parse) under collision-resistant names."""
    from dbt_gdpr_anonymizer_spark.operators.sft import chat_stats

    df = spark.createDataFrame(
        [(1, '[{"role":"user","content":"hi"}]', "x", "y")],
        ["conv_id", "transcript", "_p", "_roles"],
    )
    row = chat_stats(df).collect()[0]
    assert row["parse_ok"] and row["n_turns"] == 1


def test_chat_stats_contract(convs):
    from dbt_gdpr_anonymizer_spark.operators.sft import chat_stats

    got = {r["conv_id"]: r for r in chat_stats(convs).collect()}
    assert len(got) == 8  # one verdict per input row, malformed included
    ok = got[1]
    assert (ok["parse_ok"], ok["n_turns"], ok["alternation_ok"]) == (
        True, 2, True,
    )
    assert ok["content_chars"] == 4 and ok["last_role"] == "assistant"
    # leading system message is allowed and doesn't break alternation
    assert got[2]["alternation_ok"] and got[2]["first_role"] == "system"
    # user-user violation detected
    assert not got[3]["alternation_ok"] and got[3]["n_user"] == 2
    # malformed JSON / NULL survive with parse_ok=false, n_turns=-1
    for cid in (4, 6):
        assert not got[cid]["parse_ok"] and got[cid]["n_turns"] == -1
    # empty transcript parses but fails the >=1-real-turn gate
    assert got[5]["parse_ok"] and not got[5]["alternation_ok"]
    # assistant-first and system-only both fail alternation
    assert not got[7]["alternation_ok"]
    assert not got[8]["alternation_ok"] and got[8]["last_role"] == "system"


def test_chat_turns_order_and_content(convs):
    from dbt_gdpr_anonymizer_spark.operators.sft import chat_turns

    rows = chat_turns(convs).filter("conv_id = 2").orderBy("turn_idx").collect()
    assert [(r["turn_idx"], r["role"], r["content"]) for r in rows] == [
        (0, "system", "s"), (1, "user", "a"), (2, "assistant", "b"),
    ]
    # malformed/NULL transcripts contribute no turn rows
    from dbt_gdpr_anonymizer_spark.operators.sft import chat_turns as ct
    assert ct(convs).filter("conv_id in (4, 6)").count() == 0
