"""Plan-regression gate (round-3 verdict item #6): the headline entry
queries must keep the physical plans they were audited with. A future
change that un-pushes a filter, degrades a blocked join into
BroadcastNestedLoopJoin, or drops Python into a JVM-only query path turns
one of these red.

Checks run on the plan STRING of the executed-plan tree at sf0.001 —
cheap to build, and the properties asserted (join strategy, eval nodes,
pre-cut top-k operators) are decided at planning time.
"""

import os

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# queries whose full query path must stay JVM-side (no row-at-a-time or
# Arrow Python eval anywhere in the plan)
PURE_JVM = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "knn_topk",
    "bm25_topk_docs",
    "latest_event_per_user",
    "rerank_events",
    "paginate_customers",
    "facts_token_budget",
    "search_end_to_end",
    "hybrid_search_topk",
    "sessionized_events",
    "time_rollup_events",
    "stratified_sample_docs",
    "weighted_sample_docs",
    "shacl_violations_docs",
    "retention_cohorts_events",
    "rule_closure_orders",
    "orders_snapshot_diff",
    "entity_fact_rank_docs",
    "asof_purchase_attribution",
    "range_join_clicks",
    "salted_supplier_counts",
    "union_distinct_customers",
    "tag_filter_and_or",
    "ask_prompt_facts",
    "pagerank_copurchase",
    "triangle_counts_parts",
    "khop_parts",
    "temporal_khop_parts",
    "token_shards_docs",
    "temperature_mix_docs",
    "pmi_copurchase_edges",
    "neighbor_mean_embeddings",
    "tfidf_keywords_docs",
    "quota_cap_docs",
    "dense_node_ids",
    "degree_histogram_parts",
    "profile_documents",
    "ppr_parts",
    "pagerank_weighted_pmi",
    "link_graph_docs",
    "lm_quality_docs",
    "quantized_embeddings",
    "boilerplate_ngrams_docs",
    "adamic_adar_parts",
    "adamic_adar_capped",
    "neighbor_jaccard_parts",
    "lpa_communities_parts",
    "kcore_parts",
    "ktruss_parts",
    "harmonic_parts",
    "walk_counts_parts",
    "scc_parts",
    "modularity_parts",
    "graph_stats_parts",
    "event_transitions_events",
    "ppjoin_docs",
    "burst_events",
    "conductance_parts",
    "novelty_docs",
    "cube_orders",
    "skyline_orders",
    "cms_lineitem",
    "hll_orders",
    "bloom_probe_customers",
    "cms_join_size_est",
    "quantiles_orders",
    "bigram_lm_docs",
    "hot_keys_lineitem",
    "host_graph_docs",
    "containment_docs",
    "pmi_index_edges",
    "sssp_parts",
    # probe path of the int8-quantized LSH index: dequantize is column
    # algebra, so the query plan must stay Python-free end to end
    "ann_quantized_topk",
    "hits_parts",
    "clustering_coeff_parts",
    "line_dedup_docs",
    "random_walks_parts",
    "kg_negative_samples",
    "pagerank_warm_parts",
    "transitive_closure_parts",
    "community_rollup_parts",
    "scd2_orders",
    "orders_asof_snapshot",
    "predicate_stats_docs",
    "type_hierarchy_parts",
    "truth_discovery_orders",
    "property_table_docs",
    "bgp_match_docs",
    "meta_block_docs",
    "sorted_neighborhood_docs",
    "blocking_quality_docs",
    "er_match_scores_docs",
    "scd2_upsert_orders",
    "funnel_events",
    "assoc_rules_orders",
    "ranking_eval_events",
    "hyperanf_parts",
    "dimsum_part_pairs",
    "landmark_dist_parts",
    "gopher_gates_docs",
    "frequent_triples_orders",
    "node2vec_walks_parts",
    "fuzzy_name_pairs",
    "hll_group_suppliers",
    "mad_outliers_orders",
    "assoc_rules_index",
    "effective_diameter_parts",
    "winnow_docs",
    "hashed_tf_docs",
    "rrf_fuse_customers",
    "katz_scores_parts",
    "decayed_activity_users",
    "referential_sample_customers",
    "powerlaw_fit_parts",
    "source_percentile_docs",
    "weighted_jaccard_docs",
]

# queries that MAY use Arrow-batched Python (signature UDFs) but must
# never degrade to an unblocked cross product
NO_BNLJ_ONLY = [
    "minhash_lsh_dedup",
    "simhash_dup_pairs",
    "ngram_dup_pairs",
    "cosine_dup_pairs",
    "connected_components_star",
    "dedup_collapse_docs",
    "bcubed_dedup_docs",
]

# pre-limit pagination / budget accumulation must pre-cut with a top-k
# operator (per-partition heaps), never sort the full table
TAKE_ORDERED = [
    "knn_topk",
    "paginate_customers",
    "facts_token_budget",
]

# these queries cross-join a 1-row broadcast stats/scalar frame (BM25
# corpus header, query-vector norm) — that prints as
# BroadcastNestedLoopJoin but fans out exactly 1x per row, by design;
# they must still never plan an unbroadcast CartesianProduct
SCALAR_CROSS = {
    "knn_topk",
    "bm25_topk_docs",
    "search_end_to_end",
    "hybrid_search_topk",
    "ask_prompt_facts",
    "temperature_mix_docs",
    # HITS L2 norms: 1-row aggregate broadcast back per normalize
    "hits_parts",
    # blocking metrics: three 1-row aggregates crossed into one row
    "blocking_quality_docs",
    # fact informativeness: 1-row N aggregate broadcast into the score
    "entity_fact_rank_docs",
    # skew audit: 1-row total crossed into the top-k counts
    "hot_keys_lineitem",
    # modularity: 1-row edge-count scalar crossed into the contributions
    "modularity_parts",
    # graph stats: two 1-row moment/node aggregates crossed into one row
    "graph_stats_parts",
    # conductance: 1-row 2m scalar crossed into the community rows
    "conductance_parts",
    # HLL: 1-row estimate crossed with the 1-row exact distinct count
    "hll_orders",
    # join-size: 1-row estimate crossed with the 1-row true join count
    "cms_join_size_est",
    # landmark query workload: all pairs among <= 26 low-id parts,
    # small side broadcast (BNLJ), never an unbroadcast cartesian
    "landmark_dist_parts",
    # effective diameter: 1-row N(hops) max crossed into the hops rows
    "effective_diameter_parts",
    # decayed counters: 1-row corpus-max-T crossed into the scan
    "decayed_activity_users",
    # Hill fit: 1-row d_min crossed into the 100-row tail
    "powerlaw_fit_parts",
}


def plan_of(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanRegressions:
    @pytest.mark.parametrize("name", PURE_JVM)
    def test_no_python_on_query_path(self, spark, name):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "InPandas" not in plan, name

    @pytest.mark.parametrize("name", PURE_JVM + NO_BNLJ_ONLY)
    def test_no_nested_loop_join(self, spark, name):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        if name not in SCALAR_CROSS:
            assert "BroadcastNestedLoopJoin" not in plan, name
        else:
            # the allowed cross must be a BROADCAST nested loop (1-row
            # stats side), never a shuffle-side nested loop
            assert "BroadcastExchange" in plan, name

    @pytest.mark.parametrize("name", TAKE_ORDERED)
    def test_topk_precut(self, spark, name):
        plan = plan_of(spark, name)
        assert "TakeOrderedAndProject" in plan, name

    def test_q1_scan_prunes_columns(self, spark):
        """Column pruning must reach the lineitem scan: q1 touches 7 of 16
        columns; a ReadSchema carrying the full row width means projection
        stopped being pushed."""
        plan = plan_of(spark, "q1_pricing_summary")
        start = plan.index("ReadSchema")
        schema = plan[start:plan.index("\n", start)]
        assert "l_comment" not in schema
        assert "l_shipmode" not in schema

    def test_q3_filters_pushed(self, spark):
        """q3's segment/date predicates must reach the parquet scans."""
        plan = plan_of(spark, "q3_shipping_priority")
        assert "PushedFilters: [" in plan
        # at least one scan pushes a non-trivial predicate
        assert "IsNotNull" in plan.split("PushedFilters")[1]
