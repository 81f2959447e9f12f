"""Global physical-plan invariants over the whole query registry.

Every registered query is planned (not executed) at sf0.001 and its
physical plan checked for patterns that would be scale-killers on a real
cluster:

* ``CartesianProduct`` — never acceptable.
* ``BroadcastNestedLoopJoin`` — only for the brute-force ANN baselines,
  whose build side is an explicitly broadcast, provably small query /
  centroid set (that IS the brute-force contract; the LSH/IVF tiers are
  the scale path).
* Unpartitioned ``Window`` (empty partitionSpec — Spark plans it as a
  single-partition WindowExec, serializing the whole input through one
  task) — only over inputs bounded by CONSTRUCTION, never corpus-sized
  (see WINDOW_GLOBAL_ALLOWED). r8: orderkey_gap_islands' global
  row_number was rewritten onto relational.global_row_number (range
  buckets + broadcast offsets); r11 rewrote it again onto boundary
  anti-joins whose pairing windows run over TakeOrdered top-100
  frames, so its allowlist slot is the bounded-frame kind.

Catching these at plan level keeps a future query edit from silently
reintroducing an all-pairs join that works at sf0.01 and dies at 100 TB.
"""

from __future__ import annotations

import os

import pytest

from dbt_gdpr_anonymizer_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")

# Allowed BroadcastNestedLoopJoin cases — every one has a broadcast side
# whose size is bounded by CONSTRUCTION, not by data volume:
#   ann_cosine_topk / ann_ivf_topk / kmeans_embedding_clusters /
#   ann_recall_report — brute-force baselines and centroid tables
#     (query-set / k·dim scale);
#   tfidf_top_terms / bm25_search / sparse_cosine_search /
#   word_frequency_zipf / event_value_drift_psi — a 1-row corpus-stats
#     aggregate cross-joined in;
#   t_closeness_segments / t_closeness_numerators — group ×
#     sensitive-value grid: both cross-join sides are post-aggregation
#     tables bounded by key cardinality (the sensitive-value dim and a
#     1-row corpus total), never data volume.
#   erasure_cascade_documents was REMOVED from this list in r7: the
#     small-list tier is now a trie-regex contains-any FILTER compiled
#     from the collected term list — it plans NO join operator at all,
#     and this test pins that (a regression back to the nested-loop
#     contains join fails here).
BNLJ_ALLOWED = {
    "t_closeness_segments",
    "t_closeness_numerators",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "kmeans_embedding_clusters",
    "ann_recall_report",
    "tfidf_top_terms",
    "bm25_search",
    "sparse_cosine_search",
    "word_frequency_zipf",
    "event_value_drift_psi",
    "dataset_card_by_source",
    #   funnel_conversion — the stacked stage counts are 1-row aggregates
    #     cross-joined in (bounded by construction, never data volume)
    "funnel_conversion",
    #   source_freshness_report — the global-max is a 1-row broadcast
    #     cross join onto a per-source (bounded-cardinality) aggregate
    "source_freshness_report",
    #   mixture_sampling_plan — 1-row corpus-total broadcast cross join
    #     onto the source-cardinality plan table (same bounded pattern)
    "mixture_sampling_plan",
    #   bigram_lm_perplexity_documents / naive_bayes_lang_classifier —
    #     the model's 1-row stats frame (vocab size / class priors+totals)
    #     broadcast cross-joined into the scoring join (bounded by
    #     construction: always exactly one row)
    "bigram_lm_perplexity_documents",
    "naive_bayes_lang_classifier",
    #   trigram_lm_interpolated_documents — the same 1-row (V, T) stats
    #     frame broadcast cross-joined onto the trigram-vocab-bounded
    #     model table (the bigram/NB bounded 1-row-stats pattern)
    "trigram_lm_interpolated_documents",
    #   kn_bigram_lm_documents — the 1-row bigram-type total broadcast
    #     cross-joined onto the bigram-vocab-bounded model table (same
    #     bounded 1-row-stats pattern as the other LM queries)
    "kn_bigram_lm_documents",
    #   pmi_collocations_documents — the 1-row corpus pair total
    #     broadcast cross-joined onto the vocab-bounded min-count-cut
    #     pair table (same bounded 1-row-stats pattern)
    "pmi_collocations_documents",
    #   cm_join_size_orders_lineitem — the 1-row sketch estimate
    #     broadcast cross-joined with the 1-row exact join count (two
    #     1-row frames; the bounded 1-row-stats pattern)
    "cm_join_size_orders_lineitem",
    #   distinctive_terms_documents — the 1-row corpus token total
    #     broadcast cross-joined onto the vocab-bounded (group, word)
    #     count table (same bounded 1-row-stats pattern as bigram/NB)
    "distinctive_terms_documents",
    #   dsir_importance_weights_documents / dsir_gumbel_topk_documents —
    #     the 1-row target/pool token-totals frame broadcast cross-joined
    #     onto the bucket-bounded (<= n_buckets rows) model table
    "dsir_importance_weights_documents",
    "dsir_gumbel_topk_documents",
    #   semantic_decontaminate_embeddings — EXACT broadcast scoring
    #     against the benchmark set is the contract (eval suites are
    #     small by construction; an LSH candidate tier would lose recall
    #     exactly where misses are the failure mode)
    "semantic_decontaminate_embeddings",
    #   pq_recall_report — composes the exact cosine_topk baseline (the
    #     ann_recall_report precedent: query-set-bounded broadcast side)
    "pq_recall_report",
    #   pq_adc_topk_embeddings — the brute-force ADC tier: the broadcast
    #     side is the query-LUT table (query-set scale, the
    #     ann_cosine_topk contract); the cell-routed composition that
    #     replaces it at scale is ivf_pq_topk_embeddings, whose probe
    #     join is a broadcast HASH join and is NOT allowlisted here
    "pq_adc_topk_embeddings",
    #   zorder_layout_orders — the 1-row min/max stats frame broadcast
    #     cross-joined into the per-row key computation (the bounded
    #     1-row-stats pattern)
    "zorder_layout_orders",
    #   assoc_rules_brand_pairs — the 1-row basket-total frame broadcast
    #     cross-joined onto the brand-domain-bounded rules table (the
    #     bounded 1-row-stats pattern)
    "assoc_rules_brand_pairs",
    #   spatial_radius_pairs_customers — the 1-row max|lat| stats frame
    #     broadcast cross-joined into the per-row grid-cell computation
    #     (the bounded 1-row-stats pattern); the pair join itself is a
    #     hash equi-join on (gi, gj) and is NOT allowlisted
    "spatial_radius_pairs_customers",
    #   vocab_growth_documents — the 1-row doc-count frame broadcast
    #     cross-joined into the integer bucket assignment (the bounded
    #     1-row-stats pattern)
    "vocab_growth_documents",
    #   rfm_segments_customers — two 1-row broadcasts (corpus max date;
    #     the 12-boundary pivot row) cross-joined into per-row codegen
    #     (the bounded 1-row-stats pattern)
    "rfm_segments_customers",
    #   rrf_fusion_documents — the 1-row corpus stats (n_docs, avgdl)
    #     broadcast cross-joined into both scorers (the bm25_search
    #     bounded 1-row-stats pattern)
    "rrf_fusion_documents",
    #   mondrian_utility_customers — the 1-row global-range frame
    #     broadcast cross-joined onto the class-cardinality-bounded
    #     Mondrian box table (the bounded 1-row-stats pattern)
    "mondrian_utility_customers",
    #   q22_global_sales_opportunity — the 1-row positive-balance stats
    #     frame broadcast cross-joined into the threshold filter (the
    #     bounded 1-row-stats pattern; Q22's scalar subquery)
    "q22_global_sales_opportunity",
    #   auc_lang_classifier — composes naive_bayes_scores, whose 1-row
    #     stats frame (class priors + token totals) is the allowlisted
    #     bounded 1-row-stats crossJoin of the NB query itself
    "auc_lang_classifier",
    #   minkprob_documents — the bigram LM's 1-row vocab-size frame
    #     broadcast cross-joined onto the vocab-bounded model table
    #     (the bigram_lm_perplexity bounded 1-row-stats pattern)
    "minkprob_documents",
    #   ndcg_fused_retrieval — composes rrf_fusion (its 1-row corpus
    #     stats broadcast) plus the 1-row dcg x idcg cross join (two
    #     bounded 1-row-stats frames)
    "ndcg_fused_retrieval",
    #   jl_distortion_report — the pair fan-out is a crossJoin of two
    #     40-row query-set frames (the t_closeness/ann_cosine bounded
    #     contract); the corpus is never pair-joined
    "jl_distortion_report",
}


# Allowed unpartitioned-Window cases — every global window below runs
# over a frame bounded by CONSTRUCTION, never by corpus size:
#   word_frequency_zipf — rank over the 100 surviving top terms;
#   temperature_resample_documents — Σ over the GROUP-SIZES table
#     (group-cardinality rows: languages/domains), not the corpus;
#   token_budget_select_documents — the cumulative window runs over the
#     single boundary score-stratum only (one ppm value's population);
#     degenerate all-ties corpora are routed to the range-bucketed
#     two-pass scheme by the max_boundary_rows guard (r8).
WINDOW_GLOBAL_ALLOWED = {
    "word_frequency_zipf",
    "temperature_resample_documents",
    "token_budget_select_documents",
    #   vocab_growth_documents — the cumulative fold runs over the
    #     n_buckets-row (16) bucket frame, never the corpus
    "vocab_growth_documents",
    #   rrf_fusion_documents — the rank windows run over the two
    #     TakeOrdered top-100 frames (bounded by construction, the
    #     word_frequency_zipf precedent)
    "rrf_fusion_documents",
    #   ndcg_fused_retrieval — the rank/ideal-rank windows run over the
    #     <= 2*topn-row fused release (bounded by construction)
    "ndcg_fused_retrieval",
    #   orderkey_gap_islands — r11 anti-join rewrite: the start/end
    #     pairing row_numbers run over the two TakeOrdered top-100
    #     frames (bounded by construction, the rrf_fusion precedent);
    #     the corpus-scale work is the two hash anti self-joins
    "orderkey_gap_islands",
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_unbounded_join_in_plan(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join outside the brute-force allowlist"
        )
    if name not in WINDOW_GLOBAL_ALLOWED:
        from tests.conftest import unpartitioned_windows

        hits = unpartitioned_windows(df)
        assert not hits, (
            f"{name}: unpartitioned Window (single-partition WindowExec "
            f"at scale) outside the bounded-frame allowlist: {hits}"
        )
