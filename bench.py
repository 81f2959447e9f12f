"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop write (full computation, no sink cost,
result never collected to the driver — the honest distributed-execution
timing). Value = total wall seconds across headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Representative of every operator family: masking pipeline, relational
# agg/join/window, events (sessionize/rollup/json), validation union.
HEADLINE = [
    "mask_model_customer",
    "union_violations",
    "k_anonymity",
    "q1_pricing_summary",
    "join_revenue_by_nation",
    "topk_orders_per_bucket",
    "sessionize_events",
    "hourly_event_rollup",
    "json_props_extract",
    "exact_dedup_documents",
    "minhash_lsh_neardup",
    "ann_cosine_topk",
    "text_quality_profile",
    "rolling_fingerprint_documents",
    "winnow_overlap_pairs",
    "tfidf_top_terms",
    "sliding_window_rollup",
    # iterative + inverted-index + exact-similarity plans
    "ngram_jaccard_neardup",
    "neardup_components",
    "bm25_search",
    # newest plan shapes: Gravano gram-filter join + codegen noise ladder
    "edit_distance_neardup",
    "dp_noisy_order_counts",
    # 6-table broadcast/AQE join chain (TPC-H Q5 shape)
    "q5_local_supplier_volume",
    # r5 additions: the stateful-streaming drain (applyInPandasWithState
    # sessionization over a 3-batch replay — the drain runs inside the
    # callable, which is why timing starts before query construction) and
    # the broadcast contains-any erasure anti-join
    "stream_sessionize_events",
    "erasure_cascade_documents",
    # r5 new plan shapes: full-vocabulary explode + TakeOrdered top-k,
    # line-level explode/rebuild, and the one-pass grouping-sets ladder
    "word_frequency_zipf",
    "boilerplate_line_filter_documents",
    "k_anonymity_generalize",
    # r5 batch-2/3 shapes: staged user-keyed funnel joins, full-outer
    # fingerprint diff, and the two-phase vocab-build + token equi-join
    "funnel_conversion",
    "corpus_snapshot_diff",
    "vocab_oov_rate",
    # r5 batch 4-6 shapes: the stream-stream join state store (drain runs
    # inside the callable, like the sessionize drain), the QI-window
    # microaggregation, and the order-statistic winsorize
    "stream_interval_join_clicks",
    "microaggregate_acctbal",
    "winsorized_stats_events",
]

# neardup_components drift note (r5, data-backed): decomposed timing at
# sf0.1 shows the query = ngram_jaccard pair generation (2.4-3.0s steady,
# 8-10s first-run, swinging with host load) + 4 label-propagation rounds
# (~1.5-2s of fixed stage-scheduling overhead on a tiny graph). The
# r3→r4→r5 "regression" (2.71 → 3.51 → ~4-6s) is host-load drift on the
# shared box — every heavy query moved the same session (edit_distance
# 4.5→5.1, ngram_jaccard 2.2→2.4) and no commit has touched
# operators/graph.py since r3. A bi-side repartition+persist to reuse one
# edge shuffle across rounds was tried and reverted (made it 4.1→6.2s;
# see operators/graph.py note). RESOLVED late-r5: the bounded driver
# union-find fast path (operators/graph.py max_driver_edges — near-dup
# graphs are tiny relative to the corpus; distributed rounds remain the
# past-the-bound fallback) removes the round overhead entirely: measured
# 6.6 → 1.0s at sf0.1, oracle-identical output.
#
# Streaming-entry comparison semantics: stream_sessionize_events and
# stream_interval_join_clicks time a 3-batch stateful REPLAY end to end —
# temp-file batch prep, state-store checkpoints per micro-batch, Python
# state workers (sessionize) or double-sided join state (interval join).
# Their DuckDB oracle is the BATCH equivalence check (same final rows),
# not a throughput baseline: a batch engine replaying the same logic in
# one pass will always be faster than a micro-batch stateful drain. The
# entries are here to time the stateful plan shapes themselves
# (regressions in state sizing/partitioning show up here), per the r4
# review's request to put the newest plan shapes under timing.
#
# Timing policy: every tracked persist() is released after each run, so all
# three timed runs are COLD-cache — the number a fresh cluster job would
# see, not one inflated by a previous run's leftover blocks. This is why
# minhash_lsh_neardup reads ~2.2s here vs ~1.1s before the release was
# added (r2 bench): the old number re-used the shingle-set cache persisted
# by the PREVIOUS run's plan. Within a single run the plan still persists
# and reuses the shingle sets across its own branches (the legitimate
# shared-subplan cache in operators/dedup.py); only cross-run reuse is
# suppressed.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.queries import all_queries
    from dbt_gdpr_anonymizer_spark.session import get_spark

    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    spark.read.parquet(f"{sf_dir}/customer.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in names:
        # One untimed warm-up (plan compilation, code generation, parquet
        # footer cache), then the MEDIAN of three timed steady-state runs —
        # single-sample local-JVM timings jitter by 50-80% from GC and
        # scheduler noise; the median is the number that scales with data
        # volume rather than with warm-up or a stray pause.
        # Tracked persist()s are released after every run: without this the
        # dedup/components queries leave identical cached blocks behind on
        # each re-invocation ("already cached" warnings, growing executor
        # memory pressure) and later queries pay the eviction cost.
        warm = qs[name](spark, sf_dir)
        warm.write.format("noop").mode("overwrite").save()
        release_caches(warm)
        runs = []
        for _ in range(3):
            # t0 BEFORE query construction: streaming entries drain their
            # stream inside the callable, and plan build is part of what a
            # user pays; for batch queries the build adds only millis.
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            release_caches(df)
        timings[name] = round(sorted(runs)[1], 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
