"""Empirical cache-leak audit over the whole query registry.

Operators that persist() multi-branch intermediates track them on their
returned plan (operators/caching.py) — but DataFrame attributes do NOT
survive plan transforms, so a registry query that wraps such an operator
in .select()/.orderBy()/.unionByName() silently drops the tracking and
release_caches() on the query result frees nothing. Every bench run and
long-lived session then accumulates dead cached blocks (the r8 review
finding on orderkey_gap_islands / pagerank_documents).

This audit finds the leaks EMPIRICALLY instead of by inspection: run each
query at sf0.001, consume it (noop write), release_caches(result), and
compare the JVM persistent-RDD registry size before/after. Any positive
delta is a leak chargeable to that query.

Usage: python scripts/audit_cache_leaks.py [sf_dir] [query ...]
Exits non-zero if any query leaks.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from dbt_gdpr_anonymizer_spark.operators.caching import release_caches  # noqa: E402
from dbt_gdpr_anonymizer_spark.queries import all_queries  # noqa: E402
from dbt_gdpr_anonymizer_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("cache-leak-audit")
    jsc = spark.sparkContext._jsc.sc()
    qs = all_queries()
    leaks: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        before = jsc.getPersistentRDDs().size()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            release_caches(df)
        except Exception as e:  # surface, keep auditing the rest
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        after = jsc.getPersistentRDDs().size()
        if after > before:
            leaks[name] = after - before
            print(f"LEAK {after - before:2d}  {name}", flush=True)
    print(f"\n{len(leaks)} leaking querie(s), {len(errors)} error(s)")
    for n, e in errors.items():
        print(f"ERROR {n}: {e}")
    return 1 if leaks or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
