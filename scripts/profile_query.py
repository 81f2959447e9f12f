"""Per-query optimization profiler (r11): build/exec split, job count,
and formatted-plan capture for the queries under optimization.

Usage:
    python scripts/profile_query.py [--plans OUTDIR --tag before|after]
        [sf_dir] name [name ...]

For each named registry query, measures (median of 3 after one warm-up):
  build  = py4j plan-construction wall (callable -> DataFrame)
  exec   = noop-sink execution wall (full computation, no sink cost)
  jobs   = Spark jobs launched by one exec (statusTracker delta)
and optionally writes ``<OUTDIR>/<name>_<tag>.txt`` with the
``explain("formatted")`` output, so plan claims in OPTIMIZATION_r11.md are
checkable without running Spark.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from dbt_gdpr_anonymizer_spark.operators.caching import release_caches  # noqa: E402
from dbt_gdpr_anonymizer_spark.queries import all_queries  # noqa: E402
from dbt_gdpr_anonymizer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()
    # Warm the JVM + parquet footers (the bench does the same).
    spark.read.parquet(f"{args.sf_dir}/customer.parquet").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm-up run (codegen, footer cache) — not timed
        warm = fn(spark, args.sf_dir)
        warm.write.format("noop").mode("overwrite").save()
        if args.plans:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                warm.explain("formatted")
            import os

            os.makedirs(args.plans, exist_ok=True)
            with open(f"{args.plans}/{name}_{args.tag}.txt", "w") as f:
                f.write(buf.getvalue())
        release_caches(warm)

        builds, execs, jobs = [], [], []
        for i in range(3):
            # r12 (ADVICE): count jobs via an explicit JOB GROUP so the
            # set is exactly this measurement's jobs — the old
            # max-job-id delta counted any concurrent job in the
            # session. Caveat that remains: jobs launched from OTHER
            # threads (streaming micro-batches) don't inherit the
            # thread-local group, so stream_* job counts are lower
            # bounds here (bench.py's scale signal uses global
            # stage-id deltas instead, which do include them).
            group = f"profile:{name}:{i}"
            spark.sparkContext.setJobGroup(group, f"profile {name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            # build can launch eager jobs (collect of bounds/guards);
            # the group covers build + exec, which is what "jobs per
            # invocation" means for the record
            jobs.append(len(set(tracker.getJobIdsForGroup(group) or [])))
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
            release_caches(df)
        out[name] = {
            "build": round(sorted(builds)[1], 3),
            "exec": round(sorted(execs)[1], 3),
            "total": round(sorted(builds)[1] + sorted(execs)[1], 3),
            "jobs": sorted(jobs)[1],
        }
        spark.sparkContext.setJobDescription(None)
        print(name, out[name], flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "profile": out}))


if __name__ == "__main__":
    main()
