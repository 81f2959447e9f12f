"""Cache-lifetime bookkeeping for operators that persist() intermediates.

Several operators (``neardup_pairs``, ``ngram_jaccard_pairs``,
``simhash_neardup_pairs``, ``connected_components``) persist an expensive
intermediate (shingle sets, per-round labels) that feeds multiple branches
of the returned plan — Catalyst has no cross-branch subplan reuse, so the
cache is what keeps those plans linear. The cache must stay alive until the
caller has CONSUMED the returned DataFrame (collect/write); Spark blocks
evict lazily under memory pressure, but a long-lived session invoking such
an operator repeatedly accumulates dead blocks until then.

Contract: operators attach their persisted intermediates to the returned
DataFrame as ``df.cached_deps`` (a plain Python attribute — DataFrames are
ordinary objects). After consuming the result, callers release them::

    pairs = neardup_pairs(docs)
    pairs.write.parquet(out)
    release_caches(pairs)        # no-op for plans without tracked caches

Releasing before consumption is safe but wasteful (the work re-executes
uncached).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["track_caches", "release_caches"]

_ATTR = "cached_deps"


def track_caches(out: DataFrame, *deps: DataFrame) -> DataFrame:
    """Record ``deps`` (already-persisted DataFrames feeding ``out``) on the
    returned plan so ``release_caches`` can unpersist them later. Deps
    already tracked on an input plan should be re-tracked by wrappers that
    build on it (attributes don't propagate through plan transforms)."""
    existing = list(getattr(out, _ATTR, ()))
    setattr(out, _ATTR, existing + list(deps))
    return out


def release_caches(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist every tracked cache on ``df`` (idempotent, attribute is
    cleared). Call after the plan has been consumed."""
    for dep in getattr(df, _ATTR, ()):
        dep.unpersist(blocking)
    setattr(df, _ATTR, [])
