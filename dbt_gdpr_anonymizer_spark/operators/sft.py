"""SFT / chat-transcript preparation operators.

Instruction-tuning pipelines ingest conversations as JSON transcripts
(``[{"role": ..., "content": ...}, ...]`` — the OpenAI/ShareGPT wire shape)
and must (a) parse them at corpus scale, (b) validate the turn structure
(roles alternate user/assistant, optional leading system message), and
(c) release per-conversation statistics that drive filtering (turn counts,
role balance, content volume).

Spark-first design: the transcript column parses with ``from_json`` and
EVERY statistic is computed array-side — ``size`` / ``filter`` /
``aggregate`` / ``forall`` higher-order functions over the parsed array —
so :func:`chat_stats` is pure whole-stage codegen with ZERO shuffle and
zero Python: at 100 TB the validation pass is one narrow scan.
:func:`chat_turns` is the per-turn exploded view (one generate, still
narrow) for operators that need row-per-message (PII scrubbing of user
turns, per-role token counts).

Extension surface beyond the reference (tabodino/dbt-gdpr-anonymizer has
no conversation ops; closest analogue is the nested-JSON flattening of its
ingest script, download_data.py:24-38).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["CHAT_SCHEMA", "chat_turns", "chat_stats"]

#: Wire schema of a chat transcript: ordered messages with role + content.
CHAT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("role", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
)


def _parsed(json_col: Column | str) -> Column:
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.from_json(c, CHAT_SCHEMA)


def chat_turns(
    convs: DataFrame, json_col: str = "transcript", id_col: str = "conv_id"
) -> DataFrame:
    """Per-message view of a chat-transcript column: one row per turn,
    0-based ``turn_idx`` preserving transcript order. One ``from_json``
    + one generate (``posexplode``) — narrow, no shuffle; malformed JSON
    parses to NULL and contributes no rows (count them upstream via
    :func:`chat_stats` ``parse_ok``)."""
    return convs.select(
        F.col(id_col),
        F.posexplode(_parsed(json_col)).alias("turn_idx", "_m"),
    ).select(
        id_col,
        "turn_idx",
        F.col("_m.role").alias("role"),
        F.col("_m.content").alias("content"),
    )


def chat_stats(
    convs: DataFrame, json_col: str = "transcript", id_col: str = "conv_id"
) -> DataFrame:
    """Per-conversation SFT gate statistics, computed ENTIRELY array-side
    (higher-order functions on the parsed transcript — no explode, no
    aggregation, no shuffle; the whole operator is one codegen projection):

    - ``parse_ok`` — the JSON parsed to a message array;
    - ``n_turns``, ``n_user``, ``n_assistant`` — message counts;
    - ``alternation_ok`` — after an OPTIONAL leading ``system`` message,
      roles strictly alternate user/assistant starting with user (the
      trainable-transcript contract);
    - ``content_chars`` — total characters across message contents
      (NULL content counts 0);
    - ``first_role`` / ``last_role`` — '' for empty transcripts.

    Returns one row per input row; malformed transcripts survive with
    ``parse_ok = false`` (filter or quarantine downstream).

    The parse and the role projection are BOUND as real fields in an
    intermediate projection (r9): the stats columns are higher-order
    functions, which evaluate interpreted — inlining ``from_json`` (and
    whatever synthesis produced the JSON column upstream) into each of
    the ~8 output expressions re-parsed the transcript once per column
    per row. ``CollapseProject`` keeps the two projections separate
    because the bound aliases are non-cheap and multiply referenced, so
    the parse runs exactly once per row.
    """
    # Project ONLY (id_col, parse) into the bound frame: the output needs
    # nothing else, the narrow projection prunes the scan, and a caller
    # frame that already carries a column named like an internal alias
    # can no longer collide (r9 ADVICE; the names are prefixed anyway).
    bound = convs.select(
        F.col(id_col),
        _parsed(json_col).alias("__chat_stats_p"),
    ).select(
        "*",
        F.transform(
            F.col("__chat_stats_p"), lambda m: m["role"]
        ).alias("__chat_stats_roles"),
    )
    p = F.col("__chat_stats_p")
    roles = F.col("__chat_stats_roles")
    # Offset 1 if the transcript opens with a system message; expected
    # role at message i is then user/assistant by (i - off) parity.
    off = F.when(
        (F.size(p) > 0) & (F.try_element_at(roles, F.lit(1)) == "system"), F.lit(1)
    ).otherwise(F.lit(0))
    alternation = F.forall(
        F.zip_with(  # noqa: E501 — per-index expected-role booleans
            roles,
            F.sequence(F.lit(0), F.size(p) - 1),
            lambda r, i: F.when(i < off, F.lit(True)).otherwise(
                r
                == F.when((i - off) % 2 == 0, F.lit("user")).otherwise(
                    F.lit("assistant")
                )
            ),
        ),
        lambda ok: ok,
    ) & (F.size(p) - off >= 1)
    n_role = lambda name: F.size(  # noqa: E731
        F.filter(roles, lambda r: r == name)
    ).cast("bigint")
    return bound.select(
        F.col(id_col),
        p.isNotNull().alias("parse_ok"),
        F.coalesce(F.size(p), F.lit(-1)).cast("bigint").alias("n_turns"),
        F.coalesce(n_role("user"), F.lit(0)).alias("n_user"),
        F.coalesce(n_role("assistant"), F.lit(0)).alias("n_assistant"),
        F.coalesce(alternation, F.lit(False)).alias("alternation_ok"),
        F.coalesce(
            F.aggregate(
                p,
                F.lit(0).cast("bigint"),
                lambda acc, m: acc + F.coalesce(F.length(m["content"]), F.lit(0)),
            ),
            F.lit(0),
        ).alias("content_chars"),
        F.coalesce(F.try_element_at(roles, F.lit(1)), F.lit("")).alias("first_role"),
        F.coalesce(F.try_element_at(roles, F.lit(-1)), F.lit("")).alias("last_role"),
    )
