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
* Free-text corpora: a contains-any-literal match. Spark plans a broadcast
  nested-loop join — normally a scale red flag, but here it is the RIGHT
  plan: the broadcast side is the m-row deletion list, so the cost is one
  corpus scan × m literal probes, no shuffle, no all-pairs. ``max_terms``
  fails fast if the list stops being small (past ~10^4 literals, switch to
  a tokenize-and-equi-join on extracted identifiers, which trades substring
  generality for a hash join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.operators.caching import track_caches

__all__ = ["erase_keys", "erasure_matches", "erasure_survivors"]


def erase_keys(df: DataFrame, deletion: DataFrame, key_col: str) -> DataFrame:
    """Purge rows whose ``key_col`` appears in the deletion request list:
    broadcast left-anti hash join — the deletion list broadcasts, the data
    side streams through unshuffled."""
    return df.join(
        F.broadcast(deletion.select(key_col).distinct()), key_col, "left_anti"
    )


def _contains_join(
    docs: DataFrame,
    terms: DataFrame,
    how: str,
    text_col: str,
    term_col: str,
    max_terms: int | None,
) -> DataFrame:
    # NOTE: the guard below runs a small Spark job EAGERLY at plan-build
    # time (an exception after the broadcast kicked off would be too
    # late); it counts DISTINCT terms — the set that actually broadcasts —
    # so a deletion list with duplicate literals can't trip the cap.
    distinct_terms = terms.select(term_col).distinct()
    if max_terms is not None:
        # persist so the guard probe and the broadcast materialize the
        # distinct reduction ONCE, not twice (the term source may itself
        # be a filtered corpus scan)
        distinct_terms = distinct_terms.persist()
        probed = distinct_terms.limit(max_terms + 1).count()
        if probed > max_terms:
            distinct_terms.unpersist()
            raise ValueError(
                f"erasure term list exceeds max_terms={max_terms} distinct "
                f"terms; a per-row contains scan is O(rows·terms) — "
                f"extract identifiers and equi-join instead, or raise the "
                f"cap deliberately with max_terms=None"
            )
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
) -> DataFrame:
    """Documents mentioning ANY banned literal (left-semi contains join):
    the audit view — what WOULD be erased. Exact substring semantics, so
    ``user3@x`` never matches ``user31@x``."""
    return _contains_join(docs, terms, "left_semi", text_col, term_col, max_terms)


def erasure_survivors(
    docs: DataFrame,
    terms: DataFrame,
    *,
    text_col: str = "text",
    term_col: str = "term",
    max_terms: int | None = 10_000,
) -> DataFrame:
    """The corpus after erasure: every document containing any banned
    literal dropped (left-anti twin of :func:`erasure_matches`)."""
    return _contains_join(docs, terms, "left_anti", text_col, term_col, max_terms)
