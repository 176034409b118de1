#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query set: the scalable headliners from gistdex_spark.queries.REGISTRY —
relational aggregates/joins, kNN search (single + batched), rerank/hybrid,
dedup (exact, MinHash-LSH, SimHash), text analysis, and event windows.
The O(n^2) exact-pair queries (dedup_embedding_cosine, dedup_ngram_jaccard)
stay out of the HEADLINE set — quadratic pair counts by definition (the
round-11 block-cartesian kernel cut the constant ~70x and bounds per-task
memory, not the exponent) — but they DO run in the once-per-round full_lap
section below, so they keep a diffable timing series; their bounded scale
paths (dedup_embedding_cosine_blocked, dedup_ngram_jaccard_banded,
dedup_minhash_lsh) are in the headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "top_order_per_customer",
    "order_priority_stats",
    "knn_topk",
    "knn_batch_topk",
    "semantic_search_rerank",
    "hybrid_search",
    "search_lang_filter",
    "keyword_frequency",
    "docs_by_source",
    "dedup_exact",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "dedup_simhash_pairs",
    "lang_id",
    "quality_score",
    "token_count",
    "ann_lsh_bucket",
    "ann_ivf_probe",
    "events_hourly",
    "events_sessionize",
    "events_dedup_count",
    "chunk_fixed",
    "reconstruct_roundtrip",
    "query_chain",
    "cidoc_similarity_join",
    "cidoc_best_match",
    "topic_clusters",
    "coherence_diversity",
    "keyword_coverage",
    "code_language_census",
    "multimodal_features",
    "index_pipeline_stats",
    "detailed_score_metrics",
    "query_cache_eviction",
    "media_frame_census",
    "media_real_frame_census",
    # Training-pipeline family: end-to-end near-dup (pairs -> components
    # -> survivors), benchmark decontamination, quality gates, PII scrub.
    "dedup_survivors",
    "dedup_incremental",
    "contamination_4gram",
    "gopher_quality_flags",
    "pii_scrub",
    # Temporal joins (as-of carry-forward; grid-bucketed range join).
    "asof_purchase_view",
    "range_join_session_errors",
    # Relational widening: semi/anti joins, group-having, promo share.
    "semi_join_priority",
    "big_order_customers",
    "anti_join_quiet_parts",
    "promo_revenue_share",
    "disjunctive_predicate_revenue",
    "nation_market_share",
    "profile_documents",
    "price_quantiles",
    "corpus_curation_pipeline",
    "events_sliding_windows",
    "event_type_pivot",
    "lang_source_rollup",
    # Correlated-subquery shapes + window surface.
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q21_waiting_supplier",
    "user_interarrival_stats",
    # Round-3 relational widening + pipeline ops.
    "q7_nation_volume",
    "q9_nation_profit",
    "q10_returned_revenue",
    "q12_late_shipment_priority",
    "bigram_lm_quality",
    "eval_decontaminate_cosine",
    "shard_assignment_stats",
    "inverted_index_stats",
    "tfidf_top_terms",
    "q11_valuable_parts",
    "q20_dominant_suppliers",
    "events_hourly_dense",
    "matryoshka_recall",
    "incremental_refresh_census",
    "label_centroid_cohesion",
    "session_window_native",
    # Round-4 widening: cluster-scoped semantic dedup, Z-order cell
    # census, funnel + transition analytics, adapted TPC-H q16.
    "semdedup_prune",
    "semdedup_adaptive_prune",
    "event_transitions",
    "funnel_conversion",
    "q16_supplier_part_census",
    "zorder_cell_stats",
    "cumulative_active_users",
    "cohort_retention",
    "dsir_importance_weights",
    "fuzzy_name_pairs",
    "event_trigram_paths",
    "user_value_range_frame",
    "user_value_ewma",
    "event_value_unpivot",
    "returned_only_parts_except_all",
    "both_flags_parts_intersect_all",
    # Round-5 widening: IVF-PQ composed ANN, multi-grain census, dedup
    # health metric, and the exercised approx swaps.
    "ann_ivfpq_search",
    "grouping_sets_census",
    "dedup_component_sizes",
    "approx_quantile_audit",
    "hll_user_census",
    "neardup_pagerank",
    "ann_binary_sign",
    "bm25_topk",
    "hybrid_rrf",
    "mmr_diversify",
    "dedup_exact_substring",
    "dedup_exact_substring_removal",
    "heavy_hitters_audit",
    "rag_retrieval_pipeline",
    "prf_expanded_search",
    "bloom_prefilter_revenue",
    "weighted_sample_mixture",
    "constraint_audit",
    "peak_concurrency",
    # Round-6 widening: duplicate-mass repetition gate, contrastive
    # hard-negative mining, quality-aware dedup survivor selection.
    "gopher_dup_ngram_gate",
    "hard_negatives",
    "dedup_survivors_best_quality",
    "token_budget_fill",
    "context_window_histogram",
    "ivf_balance_audit",
    "cross_source_dup_matrix",
    "lsh_s_curve_audit",
    "unimax_mixture",
    "tokenizer_fertility_audit",
    "fertility_char_budget",
    "corpus_version_diff",
    "source_quality_drift",
    # Round-9 widening: variable-length (maximal-span) substring dedup +
    # the semantic curation flagship (gate -> adaptive SemDeDup -> census).
    "dedup_variable_substring_spans",
    "dedup_variable_substring_within",
    "dedup_variable_substring_removal",
    "corpus_curation_semantic",
    "band_skew_audit",
    # Round-10 widening: multi-table LSH ANN (union + voting forms) and
    # the augmented (non-empty) within-doc maximal-span family.
    "ann_lsh_multitable",
    "ann_lsh_vote",
    "dedup_variable_substring_within_aug",
    # Round-11 widening: the 0/1 vote form kept alongside the graded
    # default, and the bounded (sf0.1-checkable) exact-pair variants.
    "ann_lsh_vote_indicator",
    "dedup_embedding_cosine_blocked",
    "dedup_ngram_jaccard_banded",
    # Round-11 late widening: skyline, containment near-subset pairs,
    # count-min audit, epoch reshuffle, source interleave.
    "skyline_parts",
    "dedup_ngram_containment",
    "countmin_user_census",
    "epoch_shuffle_stats",
    "interleave_sources",
    "gram_novelty",
    "global_index_audit",
    # This session's widening: entropy/line gates (scan-shaped), the
    # Heaps-law and per-dim embedding audits, int8 ANN. knn_graph stays
    # in the full lap with the other exact-pair quadratics.
    "token_entropy_gate",
    "line_quality_gate",
    "heaps_law_audit",
    "embedding_dim_stats",
    "ann_int8_rerank",
    "oov_rate_audit",
    "pmi_cooccurrence",
    # Bounded-candidate kNN-graph scale paths (the exact graph and the
    # funnel stay in the full lap with the other quadratic kernels).
    "knn_graph_blocked",
    "knn_graph_multitable",
    # Round 12: the funnel flagship on the multitable kernel — the
    # bounded path belongs in the headline set like the other two —
    # plus the packing audit (range-exchange prefix sum) and the
    # unigram perplexity proxy (two equality exchanges). The
    # hard-negative miner rides the exact quadratic graph → full lap.
    "corpus_curation_funnel_blocked",
    "sequence_packing_stats",
    "unigram_logprob_quality",
    "hard_negative_mining_blocked",
    # Round 13: tokenizer-aware token accounting (frozen-merges BPE,
    # Arrow-batched UDF — map-only), its packing audit, and the
    # fixed-token-budget shard manifest (range exchange + hash agg).
    "token_count_bpe",
    "sequence_packing_stats_bpe",
    "shard_manifest_census",
    # MinHash benchmark decontamination: banded cross join, the scale
    # shape of the hygiene pass (never a corpus×corpus product).
    "eval_decontaminate_minhash",
    # Round 14: the BPE unit threaded through the per-token operators
    # (subword unigram log-prob, subword vocab coverage, subword OOV)
    # — UDF + explode + the whitespace forms' exchange shapes.
    "unigram_logprob_bpe",
    "vocab_coverage_bpe",
    "oov_rate_bpe",
    # The shard WRITER (manifest consumer): each lap really writes the
    # packed shards and re-censuses the written bytes — the honest cost
    # of the write+read path, not a cached frame.
    "shard_write_census",
    # Stored-benchmark decontamination: each lap writes the benchmark
    # signature store and probes the corpus against it — the honest
    # write+probe cost (production writes once; the probe is the
    # recurring part).
    "eval_decontaminate_minhash_stored",
    # Subword Heaps-law curve + the BPE-unit shard writer (real write
    # each lap, like shard_write_census).
    "heaps_law_bpe",
    "shard_write_census_bpe",
    # The two writer compositions: curated corpus -> packed shards
    # under one oracle, and write-then-APPEND converging to the
    # one-shot assignment (each lap really writes both passes).
    "curated_shard_write_census",
    "shard_append_census",
    # Domain-mixture resampling materialized into shards (surrogate-id
    # stream; real write each lap).
    "resampled_shard_write_census",
    # Curriculum (quality-DESC) ordering materialized into shards.
    "curriculum_shard_write_census",
    # Byte-budget media shards (binary payloads through the same
    # writer; octet-length unit).
    "media_shard_write_census",
]


def ab_main(argv: list[str]) -> None:
    """Interleaved same-box A/B: ``bench.py --ab <ref_tree> --queries
    a,b,c [--runs 3] [--out ab.json]``.

    Every round since r10 has burned a session hand-adjudicating
    whether a bench riser is code or ambient box noise (this VM's CPU
    steal swings identical code up to 1.9× between windows — measured
    by the r12 judge on byte-identical trees). This mode makes the
    adjudication a harness feature: two long-lived workers (ab_worker
    .py) — HEAD and a reference worktree — run the SAME query
    alternately in the SAME minutes, with the A/B order flipped every
    lap so slow drift cancels too. Paired mins + the head/ref ratio
    per query are the artifact; a ratio near 1.0 on elevated absolute
    numbers is the 'ambient' verdict, a ratio that survives pairing is
    real.
    """
    import argparse
    import subprocess

    ap = argparse.ArgumentParser(prog="bench.py --ab")
    ap.add_argument("ref_tree", help="path to the reference worktree")
    ap.add_argument("--queries", required=True,
                    help="comma-separated registry names")
    ap.add_argument("--runs", type=int, default=3,
                    help="timed laps per side (min is reported)")
    ap.add_argument("--out", default=None, help="also write JSON here")
    ap.add_argument(
        "--with-null", action="store_true",
        help="after the A/B laps, run the same queries against a SECOND "
        "head worker (head vs head on byte-identical code) and report "
        "null_ratio_min per query — the harness's own noise floor. The "
        "r14 null experiment measured first-spawned-worker ratios up to "
        "~1.27 on identical code; a ratio_min under the null floor is "
        "NOT evidence of a regression.",
    )
    args = ap.parse_args(argv)

    here = os.path.dirname(os.path.abspath(__file__))
    ref = os.path.abspath(args.ref_tree)
    if not os.path.isdir(os.path.join(ref, "gistdex_spark")):
        raise SystemExit(f"--ab: {ref} has no gistdex_spark package")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in args.queries.split(",") if n]

    worker_py = os.path.join(here, "ab_worker.py")

    def spawn(tree: str, label: str) -> subprocess.Popen:
        env = dict(os.environ)
        # Each worker must resolve gistdex_spark from ITS tree only.
        env["PYTHONPATH"] = tree
        p = subprocess.Popen(
            [sys.executable, worker_py, tree],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            cwd=tree, env=env, text=True,
        )
        hello = json.loads(p.stdout.readline())
        assert hello.get("ready") and hello["module"].startswith(tree), (
            label, hello,
        )
        print(f"# {label}: ready ({hello['module']})",
              file=sys.stderr, flush=True)
        return p

    def ask(p: subprocess.Popen, query: str) -> float:
        p.stdin.write(json.dumps({"query": query, "sf_dir": sf_dir}) + "\n")
        p.stdin.flush()
        resp = json.loads(p.stdout.readline())
        if "error" in resp:
            raise RuntimeError(f"{query}: {resp['error']}")
        return resp["sec"]

    head = spawn(here, "head")
    refw = spawn(ref, "ref")
    procs = [head, refw]
    try:
        results: dict[str, dict] = {}
        # per-side untimed warm-up of every query (JIT/footers), then
        # interleaved timed laps with alternating order.
        for q in names:
            ask(head, q)
            ask(refw, q)
            results[q] = {"head": [], "ref": []}
        for lap in range(args.runs):
            for q in names:
                order = (
                    [("head", head), ("ref", refw)]
                    if lap % 2 == 0
                    else [("ref", refw), ("head", head)]
                )
                for label, p in order:
                    sec = ask(p, q)
                    results[q][label].append(round(sec, 3))
                print(
                    f"# lap{lap} {q}: head {results[q]['head'][-1]:.2f}s"
                    f" ref {results[q]['ref'][-1]:.2f}s",
                    file=sys.stderr, flush=True,
                )
        if args.with_null:
            # Null calibration: the SAME protocol, head vs a second
            # head worker on byte-identical code. Whatever ratio this
            # yields is pure harness/process bias (spawn order, JVM
            # heap layout, ambient steal) — the floor below which the
            # main ratios carry no signal.
            null = spawn(here, "null")
            procs.append(null)
            for q in names:
                ask(null, q)
                results[q]["null_a"] = []
                results[q]["null_b"] = []
            for lap in range(args.runs):
                for q in names:
                    order = (
                        [("null_a", head), ("null_b", null)]
                        if lap % 2 == 0
                        else [("null_b", null), ("null_a", head)]
                    )
                    for label, p in order:
                        results[q][label].append(round(ask(p, q), 3))
                    print(
                        f"# null lap{lap} {q}: a "
                        f"{results[q]['null_a'][-1]:.2f}s b "
                        f"{results[q]['null_b'][-1]:.2f}s",
                        file=sys.stderr, flush=True,
                    )
            null.stdin.write(json.dumps({"cmd": "quit"}) + "\n")
            null.stdin.flush()
        for p in (head, refw):
            p.stdin.write(json.dumps({"cmd": "quit"}) + "\n")
            p.stdin.flush()
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()

    for q, r in results.items():
        r["head_min"] = min(r["head"])
        r["ref_min"] = min(r["ref"])
        r["ratio_min"] = round(r["head_min"] / r["ref_min"], 3)
        if "null_a" in r:
            r["null_ratio_min"] = round(
                min(r["null_a"]) / min(r["null_b"]), 3
            )
    payload = {
        "metric": "ab_paired_interleaved",
        "sf_dir": sf_dir,
        "ref_tree": ref,
        "runs": args.runs,
        "queries": results,
        "unit": "sec",
    }
    out = json.dumps(payload)
    print(out, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from gistdex_spark.session import get_spark

    spark = get_spark("gistdex-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from gistdex_spark.queries import REGISTRY

    # Warm up the JVM/codegen path once so per-query numbers measure the
    # engine, not first-job session setup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Warm the Python/Arrow worker pool too — otherwise the first
    # pandas-UDF query pays worker fork/startup inside its timed section.
    from gistdex_spark.functions.embedder import embed_udf  # noqa: PLC0415

    spark.range(256).repartition(int(cpus)).selectExpr(
        "cast(id as string) as t"
    ).select(embed_udf(dim=4)("t")).collect()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # Optional subset (comma-separated query names): the per-family
    # regression harness and the sf1 heavy-query artifact reuse this
    # exact timing loop instead of forking their own.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    names = (
        [n for n in only.split(",") if n] if only else BENCH_QUERIES
    )
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_ONLY names not in registry: {unknown}; "
            f"closest matches: "
            f"{sorted(k for k in REGISTRY if any(u[:6] in k for u in unknown))[:8]}"
        )
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in names:
        fn = REGISTRY[name]
        try:
            # One untimed warm-up run per query (hyperfine's --warmup
            # convention, which the reference's own benchmark harness
            # uses): the first execution of a plan pays Janino/JIT
            # compilation of its generated code and first-touch parquet
            # footer reads — session costs, not engine throughput. Then
            # MEDIAN of n timed runs: this VM's episodic CPU steal swings
            # single steady-state runs ±50%, which makes round-over-round
            # single-number deltas noise; the median (min also reported)
            # makes them signal.
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs: list[float] = []
            for _ in range(n_runs):
                t0 = time.time()
                df = fn(spark, sf_dir)
                # Materialize through a noop sink: every column is fully
                # evaluated, so Catalyst can't prune the expensive
                # expressions the way a bare count() would (a count
                # benches the scan, not the work).
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
        except Exception as exc:  # one bad query must not zero the round
            errors[name] = str(exc).split("\n")[0][:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr, flush=True)
            continue
        dt = sorted(runs)[len(runs) // 2]
        timings[name] = round(dt, 3)
        timings_min[name] = round(min(runs), 3)
        total += dt
        print(f"# {name}: {dt:.2f}s (min {min(runs):.2f}s)",
              file=sys.stderr, flush=True)

    # Full-registry lap (r10 verdict item 5): the ~54 registry queries
    # outside the headline list only had single-run parity `sec`s that
    # nobody diffed round-over-round — time them here too (min-of-3,
    # 1 warmup; min, not median: these are sub-second queries where the
    # floor is the engine and anything above it is scheduler noise) so
    # every registry query has a diffable series in the bench artifact.
    # Skipped in subset (SPARK_GRAFT_BENCH_ONLY) runs; disable with
    # SPARK_GRAFT_FULL_LAP=0.
    full_lap: dict[str, float] = {}
    full_total = 0.0
    if not only and os.environ.get("SPARK_GRAFT_FULL_LAP", "1") != "0":
        rest = [n for n in REGISTRY if n not in BENCH_QUERIES]
        for name in rest:
            fn = REGISTRY[name]
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs = []
                for _ in range(3):
                    t0 = time.time()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs.append(time.time() - t0)
            except Exception as exc:
                errors[name] = str(exc).split("\n")[0][:300]
                print(f"# full_lap {name}: FAILED {errors[name]}",
                      file=sys.stderr, flush=True)
                continue
            full_lap[name] = round(min(runs), 3)
            full_total += full_lap[name]
            print(f"# full_lap {name}: min {full_lap[name]:.2f}s",
                  file=sys.stderr, flush=True)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    payload = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "sf": sf_val,
        "timing": f"median_of_{n_runs}_1_warmup",
    }
    if full_lap:
        payload["full_lap"] = full_lap
        payload["full_lap_total"] = round(full_total, 3)
        payload["full_lap_timing"] = "min_of_3_1_warmup"
    if errors:
        # Failed queries contribute no time, so `value` alone would read
        # BETTER on a broken round — surface the failure count at top
        # level so cross-round comparisons can't miss it.
        payload["errors"] = errors
        payload["n_failed"] = len(errors)
    out_line = json.dumps(payload)
    print(out_line, flush=True)
    # Artifact hand-off hardening (r14 verdict item 4): the one-line
    # payload is ~8 KB+ and a truncated stdout capture erased round 13's
    # comparability (BENCH_r13.json rc=0 but parsed:null). Also write it
    # to bench_last.json next to this script so a whole-file read can
    # always recover the payload. Additions-only: stdout stays the
    # contract and is printed first.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "bench_last.json"
            ),
            "w",
        ) as f:
            f.write(out_line + "\n")
    except OSError as exc:  # a read-only checkout must not fail the bench
        print(f"# bench_last.json not written: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ab":
        ab_main(sys.argv[2:])
    else:
        main()
