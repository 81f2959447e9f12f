"""GDPR Article-17 erasure (right to be forgotten) at corpus scale.

The reference anonymizes columns in place (dbt_project/macros/privacy/*.sql);
a training-data pipeline additionally needs DELETION: given an erasure
request list, purge the subject's rows from structured tables AND every
free-text document that mentions the subject's identifiers — before the
corpus is snapshotted for training.

Plan shapes, by table kind:

* Structured tables (events, orders, ...): broadcast LEFT ANTI join on the
  subject key. The deletion list is tiny by nature (requests, not users),
  so the corpus side never shuffles and the filter rides the scan.
* Free-text corpora, SMALL term list (≤ ``max_terms``): a contains-any-
  literal match. Spark plans a broadcast nested-loop join — normally a
  scale red flag, but here it is the RIGHT plan: the broadcast side is the
  m-row deletion list, so the cost is one corpus scan × m literal probes,
  no shuffle, no all-pairs.
* Free-text corpora, LARGE term list (> ``max_terms``): the per-row
  contains scan is O(rows·terms) and stops being viable past ~10^4
  literals. The operator automatically switches to a TOKEN EQUI-JOIN:
  documents are split into whitespace-delimited tokens (trimmed of
  surrounding punctuation), tokens hash-join the term list, and the
  matched-document set (bounded by match count, so AQE broadcasts it when
  small) semi/anti-filters the corpus. Cost is O(tokens) hash probes —
  independent of term count — at the price of SEMANTICS: matching
  degrades from arbitrary-substring to delimited-token equality, which is
  exactly the identifier semantics (emails, phone numbers, usernames)
  erasure term lists carry. Pass ``overflow="error"`` to refuse instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.caching import track_caches

__all__ = [
    "erase_keys",
    "erasure_matches",
    "erasure_survivors",
    "IDENT_TRIM_RE",
]

# Strips non-identifier punctuation from token ENDS so "(user3@x.fr),"
# matches the term "user3@x.fr"; identifier-interior chars (@ . _ + -)
# are preserved. Shared verbatim with the registry oracle SQL.
IDENT_TRIM_RE = r"^[^A-Za-z0-9@._+-]+|[^A-Za-z0-9@._+-]+$"


def erase_keys(df: DataFrame, deletion: DataFrame, key_col: str) -> DataFrame:
    """Purge rows whose ``key_col`` appears in the deletion request list:
    broadcast left-anti hash join — the deletion list broadcasts, the data
    side streams through unshuffled."""
    return df.join(
        F.broadcast(deletion.select(key_col).distinct()), key_col, "left_anti"
    )


def _token_equijoin(
    docs: DataFrame,
    distinct_terms: DataFrame,
    how: str,
    text_col: str,
    term_col: str,
) -> DataFrame:
    """Large-term-list path: delimited-token equality via hash equi-join.

    Phase 1 scans the corpus projecting ONLY the text column (column-
    pruned), explodes whitespace tokens (map-side, no shuffle), trims
    surrounding punctuation, and hash-joins the term list — one shuffle
    keyed on the token, cost independent of term count. Phase 2 semi/anti-
    joins the corpus against the distinct MATCHED text set, which is
    bounded by the number of matching documents (erasure matches are rare
    by nature), so AQE converts it to a runtime broadcast and the corpus
    side never shuffles. Two corpus scans total — the price of keeping the
    operator generic over schemaless inputs (no id column required); both
    scans are column-pruned to what they need.
    """
    toks = docs.select(F.col(text_col).alias("_mt")).select(
        "_mt",
        F.explode(F.split(F.col("_mt"), r"\s+")).alias("_rawtok"),
    ).select(
        "_mt",
        F.regexp_replace(F.col("_rawtok"), IDENT_TRIM_RE, "").alias("_tok"),
    )
    matched = (
        toks.join(
            distinct_terms, toks["_tok"] == F.col(term_col), "left_semi"
        )
        .select("_mt")
        .distinct()
    )
    return docs.join(matched, F.col(text_col) == matched["_mt"], how).select(
        *docs.columns
    )


def _contains_join(
    docs: DataFrame,
    terms: DataFrame,
    how: str,
    text_col: str,
    term_col: str,
    max_terms: int | None,
    overflow: str,
) -> DataFrame:
    # NOTE: the guard below runs a small Spark job EAGERLY at plan-build
    # time (an exception after the broadcast kicked off would be too
    # late); it counts DISTINCT terms — the set that actually broadcasts —
    # so a deletion list with duplicate literals can't trip the cap.
    distinct_terms = terms.select(term_col).distinct()
    if max_terms is not None:
        # persist so the guard probe and the downstream join materialize
        # the distinct reduction ONCE, not twice (the term source may
        # itself be a filtered corpus scan)
        distinct_terms = distinct_terms.persist()
        probed = distinct_terms.limit(max_terms + 1).count()
        if probed > max_terms:
            if overflow == "error":
                distinct_terms.unpersist()
                raise ValueError(
                    f"erasure term list exceeds max_terms={max_terms} "
                    f"distinct terms; a per-row contains scan is "
                    f"O(rows·terms) — pass overflow='token_join' for the "
                    f"hash-join token-equality path, or raise the cap "
                    f"deliberately with max_terms=None"
                )
            out = _token_equijoin(
                docs, distinct_terms, how, text_col, term_col
            )
            return track_caches(out, distinct_terms)
    out = docs.join(
        F.broadcast(distinct_terms),
        F.col(text_col).contains(F.col(term_col)),
        how,
    )
    # tracked so the caller's release_caches() frees the term cache
    return track_caches(out, distinct_terms) if max_terms is not None else out


def erasure_matches(
    docs: DataFrame,
    terms: DataFrame,
    *,
    text_col: str = "text",
    term_col: str = "term",
    max_terms: int | None = 10_000,
    overflow: str = "token_join",
) -> DataFrame:
    """Documents mentioning ANY banned literal (left-semi contains join):
    the audit view — what WOULD be erased. Exact substring semantics up to
    ``max_terms`` distinct terms (``user3@x`` never matches ``user31@x``);
    past the cap the operator switches to delimited-token equality via a
    hash equi-join (see module docstring), or raises when
    ``overflow="error"``."""
    return _contains_join(
        docs, terms, "left_semi", text_col, term_col, max_terms, overflow
    )


def erasure_survivors(
    docs: DataFrame,
    terms: DataFrame,
    *,
    text_col: str = "text",
    term_col: str = "term",
    max_terms: int | None = 10_000,
    overflow: str = "token_join",
) -> DataFrame:
    """The corpus after erasure: every document containing any banned
    literal dropped (left-anti twin of :func:`erasure_matches`)."""
    return _contains_join(
        docs, terms, "left_anti", text_col, term_col, max_terms, overflow
    )
