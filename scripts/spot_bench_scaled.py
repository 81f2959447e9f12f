"""Core-count scaling spot-bench on the replicated large fixture.

Times a fixed list of DATA-BOUND headline queries (no near-dup class —
see make_scaled_data.py — and no capped-oracle queries) with the noop
sink at the current ``$SPARK_GRAFT_CPUS``, one warm-up + median of 3,
exactly the bench methodology. Run it twice (cpus=8 and cpus=32) over
the same fixture and compare: ratios well above 1 show the plans are
data-parallel once rows dominate scheduling overhead — the scale signal
the sf0.1 bench cannot produce (r11 driver scaling block ≈ 1 everywhere).

Usage:
    python scripts/make_scaled_data.py            # once, builds /tmp/scaled_sf1
    SPARK_GRAFT_CPUS=8  python scripts/spot_bench_scaled.py > SCALE_SPOT_c8.json
    SPARK_GRAFT_CPUS=32 python scripts/spot_bench_scaled.py > SCALE_SPOT_c32.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "join_revenue_by_nation",
    "topk_orders_per_bucket",
    "hourly_event_rollup",
    "sessionize_events",
    "winsorized_stats_events",
    "word_frequency_zipf",
    "tfidf_top_terms",
    "text_quality_profile",
    "bigram_lm_perplexity_documents",
    "char_entropy_documents",
    "stream_sessionize_events",
]


def main() -> None:
    sf_dir = os.environ.get("SCALED_DIR", "/tmp/scaled_sf1")
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.queries import all_queries
    from dbt_gdpr_anonymizer_spark.session import get_spark

    spark = get_spark("spot_scaled")
    qs = all_queries()
    spark.read.parquet(f"{sf_dir}/customer.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name in QUERIES:
        warm = qs[name](spark, sf_dir)
        warm.write.format("noop").mode("overwrite").save()
        release_caches(warm)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            release_caches(df)
        out[name] = round(sorted(runs)[1], 3)
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "fixture": sf_dir,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0")),
                "queries": out,
                "total": round(sum(out.values()), 3),
            },
            indent=1,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
