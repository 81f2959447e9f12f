"""The registry's physical-plan invariants applied to the STAGED tier
(r13 candidates): no cartesians, nested-loop joins only where a side is
bounded by construction, no unpartitioned corpus windows. Keeping the
staged plans to the same bar means registration day cannot import a
scale-killer."""

from __future__ import annotations

import os

import pytest

from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
from dbt_gdpr_anonymizer_spark.queries import STAGED_QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")

# Bounded-by-construction BroadcastNestedLoopJoin sides (the registry
# allowlist's 1-row-stats / query-set patterns):
BNLJ_ALLOWED = {
    #   pq_residual_recall — composes the exact cosine_topk baseline
    #     (query-set-bounded broadcast, the pq_recall_report contract)
    "pq_residual_recall",
    #   q11/q15 — the 1-row totals/max stats frame cross-joined in
    #     (the q22 scalar-subquery pattern)
    "q11_important_stock",
    "q15_top_supplier",
    #   seq patterns — the 1-row distinct-user-count broadcast
    "seq_2patterns_events",
    "seq_3patterns_events",
    #   hazard — the 1-row corpus-max-timestamp broadcast (censoring age)
    "time_to_purchase_hazard_events",
    #   dbscan/kcore — the grid tier's 1-row max|lat| stats broadcast
    #     (the spatial_radius_pairs_customers pattern); the pair join is
    #     a hash equi-join and stays un-allowlisted
    "dbscan_customers",
    "kcore_spatial_customers",
}

WINDOW_GLOBAL_ALLOWED: set[str] = set()


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_no_unbounded_join_in_staged_plan(spark, name):
    df = STAGED_QUERIES[name](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    try:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        if name not in BNLJ_ALLOWED:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: nested-loop join outside the bounded allowlist"
            )
        if name not in WINDOW_GLOBAL_ALLOWED:
            from tests.conftest import unpartitioned_windows

            hits = unpartitioned_windows(df)
            assert not hits, (
                f"{name}: unpartitioned Window outside the allowlist: "
                f"{hits}"
            )
    finally:
        release_caches(df)
