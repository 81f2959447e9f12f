"""Cache-leak audit for the STAGED tier (the audit_cache_leaks.py loop
over STAGED_QUERIES).

localCheckpoint-based queries (dbscan/kcore: lineage-truncation is what
keeps their 3^rounds analyzer blowup away) hold their checkpoint blocks
until the ContextCleaner GCs the RDD — release_caches cannot free them
by design. The audit nudges a JVM GC and retries before charging a
leak, and reports any residual checkpoint storage separately from a
true persist() leak.

Usage: python scripts/audit_staged_cache_leaks.py [sf_dir] [query ...]
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, ".")

from dbt_gdpr_anonymizer_spark.operators.caching import release_caches  # noqa: E402
from dbt_gdpr_anonymizer_spark.queries import STAGED_QUERIES  # noqa: E402
from dbt_gdpr_anonymizer_spark.session import get_spark  # noqa: E402

CHECKPOINT_BASED = {"dbscan_customers", "kcore_spatial_customers"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("staged-cache-leak-audit")
    jsc = spark.sparkContext._jsc.sc()
    jvm = spark.sparkContext._jvm
    leaks: dict[str, int] = {}
    residuals: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, fn in STAGED_QUERIES.items():
        if only and name not in only:
            continue
        before = jsc.getPersistentRDDs().size()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            release_caches(df)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        df = None
        after = jsc.getPersistentRDDs().size()
        if after > before:
            # checkpoint blocks free via ContextCleaner on GC, not via
            # release_caches — nudge and re-read before judging
            for _ in range(6):
                gc.collect()  # drop py4j refs so ContextCleaner can act
                jvm.System.gc()
                time.sleep(0.5)
                after = jsc.getPersistentRDDs().size()
                if after <= before:
                    break
        if after > before:
            if name in CHECKPOINT_BASED:
                residuals[name] = after - before
                print(f"CHECKPOINT-RESIDUAL {after - before:2d}  {name}",
                      flush=True)
            else:
                leaks[name] = after - before
                print(f"LEAK {after - before:2d}  {name}", flush=True)
    print(
        f"\n{len(leaks)} leaking querie(s), "
        f"{len(residuals)} checkpoint residual(s), {len(errors)} error(s)"
    )
    for n, e in errors.items():
        print(f"ERROR {n}: {e}")
    return 1 if leaks or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
