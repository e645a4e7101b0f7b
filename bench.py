"""Driver bench contract: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect). The suite
covers every operator family: vector top-k, BM25, hybrid fusion
(flagship), relational joins/aggs, dedup (minhash + simhash), hierarchy
materialization, ANN, windowed events.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "hybrid_rrf",
    "vector_topk",
    "bm25_topk",
    "fusion_normalized",
    "tpch_q1",
    "revenue_by_nation",
    "events_window_agg",
    "minhash_pairs",
    "simhash_pairs",
    "embedding_neardup",
    "m1_chunks",
    "m2_facts",
    "ann_ivf_topk",
    "graph_contextual",
    "token_stats",
]
# round-2+ additions, timed and reported but kept OUT of the headline
# total so `value` stays comparable round-over-round
EXTRA = [
    "ivf_knn_join",
    "contextual_chunks",
    "corpus_filter_pipeline",
    "speculative_prefetch",
    # round 3
    "graph_pagerank",
    "pq_topk",
    "phrase_search",
    "collocations_pmi",
    "cluster_keywords",
    "bigram_logprob",
    "mmr_rerank",
    "hard_negatives",
    "value_bands",
    "ann_multiprobe",
    # round 4
    "tpch_q5",
    "tpch_q18",
    "hll_users",
    "cms_heavy_hitters",
    "cdc_chunks",
    # exact-tier dedup representative: the banded REPORT over the same
    # AllPairs/PPJoin pair set. prefix_filter_pairs itself emits ~1M
    # pairs at sf0.1 on this template corpus and its 22s bench slot was
    # ~45% driver row transfer — the stats twin times the exact-tier
    # compute without the collect artifact (pairs stay oracle-checked).
    "prefix_filter_stats",
    "value_outliers_mad",
    "graph_triangles",
    "event_funnel",
    "user_retention",
    "bloom_semi_join",
    # round 4, TPC-H completion batch (q21 is the heaviest: distinct
    # pair-sets + semi/anti correlation on the fact table)
    "tpch_q9",
    "tpch_q13",
    "tpch_q21",
    "zorder_stats",
    "hist_quantiles",
    "matryoshka_topk",
    "session_rollup",
    "proximity_search",
    "typo_pairs",
    "bpe_merges",
    # round 4, late additions
    "temperature_resample",
    "reservoir_sample",
    "corpus_report",
    "pca_top",
    "value_drift_psi",
    "snapshot_diff",
    "hll_by_type",
    "asof_forward",
    "graph_ppr",
    "salted_event_totals",
    "fk_integrity",
    "containment_pairs",
    # round 5
    "rm3_expand",
    "ann_recall_audit",
    "time_grid_fill",
    "vocab_overlap_hll",
    "weighted_sample",
    "graph_communities",
    "bpe_merges_batched",
    "routed_hybrid",
    "scd2_versions",
    "events_profile",
    "uniform_negatives",
    "click_attribution",
    "bm25_v2_topk",
    "fusion_percentile",
    "late_interaction",
    "token_budget_mix",
    "quality_dedup_keep",
    "ql_dirichlet",
    "hist_quantiles_by_type",
    "ltr_features",
    "entity_cooccurrence",
    "minhash_accuracy",
    "source_concentration",
    "asof_nearest",
    "ohlc_bars",
    "dau_growth",
    "ewma_smooth",
    "item_cooccurrence",
    "doc_keyterms",
    "search_highlights",
    # round 6 (driver r4)
    "hybrid_rrf_3way",
    "m2_facts_extractor",
    "media_resize_plan",
    "media_frame_plan",
    "char_entropy",
    "ngram_novelty",
    "routed_hybrid_3way",
    "bq_topk",
    "hybrid_text_query",
    "sentence_chunks",
    "compaction_plan",
    "join_skew_report",
    "split_leakage",
    "hybrid_batch",
    "bq_store_topk",
    "hybrid_batch_3way",
    # round 7-late (driver r4): lifecycle, graph, curation, monitoring
    "index_compact",
    "mutual_knn",
    "tokenizer_fertility",
    "embedding_outliers",
    "backfill_queue",
    "graph_kcore",
    "ann_store_lifecycle",
    "spellfix_search",
    "bm25_stream_index",
    "retriever_agreement",
    "corpus_manifest",
    "rolling_anomaly",
    "signal_correlation",
    "forecast_error",
    "scd2_snapshot",
    "more_like_this",
    "classifier_calibration",
    "query_difficulty",
    "quota_topk",
    "ann_stream_store",
    "train_classifier",
    "classifier_eval",
    "dup_clusters_inc",
    "dedup_rate_by_source",
    # round 5 (driver r5): MSMG, LLM-mode seams, knowledge corpus,
    # control plane, served-index paths, co-occurrence core
    "msmg_rollup",
    "msmg_neighborhood",
    "m1_episodes_former",
    "m6_contextual_enhancer",
    "hybrid_with_knowledge",
    "api_key_scope",
    "cooc_kcore",
    "boilerplate_removal",
    "tag_documents",
    "fact_conflicts",
    # round 6
    "fact_conflicts_cumulative",
    "fact_validation_cumulative",
    "source_kl",
    "zipf_slope",
    "centroid_shift",
    "fact_conflicts_detector",
    "fact_consolidation",
    "fact_validation",
    "semdedup_keep",
    "interval_overlap",
    # round 7: token-budget chunker, exact token tier, A7 read paths
    "token_chunks",
    "token_stats_bpe",
    "perf_monitor_stats",
    "perf_regressions",
    "minhash_recall_audit",
    "simhash_recall_audit",
    # round 9
    "semdedup_scaled",
    "lsh_tuning",
    "dedup_threshold_sweep",
    "pack_density",
    # round 10: bounded-degree kNN graph store + kernels over it
    "knn_edges_store",
    "knn_graph_pagerank",
    "knn_graph_kcore",
    "knn_graph_ppr",
    "knn_graph_communities",
    "knn_graph_contextual",
    # round 10b: incremental (frozen-quantizer) kNN store
    "knn_store_append",
    "knn_store_inc_pagerank",
    "knn_store_drift",
]
# Machine-readable environment requirements for slots whose SCALED
# probe exceeds the default single-JVM bench environment (VERDICT r8
# #7 — this used to live only in PLANS.md prose). The sf0.1 bench run
# needs none of these; the field rides BENCH_DETAIL.json so a reader
# of a probe failure sees the constraint from the artifact alone, and
# tools/scaling_probe.py warns up front when the running JVM is below
# a flagged slot's floor.
SLOT_REQUIRES = {
    "fact_conflicts_cumulative": {
        "at_scale": "1000x (100M events)",
        "driver_memory": "24g",
        "reason": (
            "the decade-5 probe materializes the m1/m2 ingest stores "
            "(~20M chunk rows localCheckpointed) on one JVM before the "
            "conflict replay; the 8g default heap OOMs in the store "
            "build. On a cluster the stores shard by conversation — a "
            "single-box measurement ceiling, not a plan property "
            "(PLANS.md round-10, measured 49.9s/30.6s at 24g; the "
            "10x/100x legs run fine at 8g)"
        ),
    },
    "cooc_kcore": {
        "at_scale": "100x (60M lineitem)",
        "driver_memory": "24g",
        "reason": (
            "capped candidate projection is ~1.2B narrow rows at 100x "
            "(linear by the 64-item basket cap) and its one shuffle "
            "OOMs the 8g default heap's parquet read-ahead on a single "
            "JVM; the plan shards by customer then item key, so on a "
            "cluster the per-executor share is corpus/|executors| — a "
            "single-box measurement ceiling, not a plan property "
            "(PLANS.md round-8b, measured 588.7s/249.0s at 24g)"
        ),
    },
}

# Real-model-tier twins (deterministic stand-in models, models.py):
# resolved from q_* functions directly — deliberately NOT queries()
# entries (no DuckDB oracle is possible for the seeded projection;
# python-parity lives in pytest). Timed and reported like EXTRA.
MODEL_TIER = [
    "model_embed_bench",
    "model_rerank_bench",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from memfuse_spark.session import get_spark
    from tools.runlock import acquire_run_lock

    import __spark_entry__ as entrymod

    # Never time a bench while a verify/pytest run is eating the host's
    # cores: the r3/r4 logs both recorded 2x-inflated numbers from
    # exactly that overlap. Blocks until the other run finishes.
    _lock = acquire_run_lock("bench")  # noqa: F841 — held to exit

    spark = get_spark("memfuse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # JVM + parquet-footer warmup (not counted): tiny scan of each table
    from memfuse_spark.catalog import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()
    # Codegen warmup (not counted): run every suite query once at the
    # smallest SF. Whole-stage-codegen sources are data-independent and
    # cached JVM-wide (Janino compile of the widest expressions here
    # costs ~10s on first execution), so this compiles every plan
    # fragment without precomputing ANY work on the measured dataset —
    # the steady-state a long-lived cluster service actually runs in.
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    qs_warm = entrymod.queries()
    entrymod._postings_index(spark, warm_dir)
    entrymod._graph_edges(spark, warm_dir)
    for name in HEADLINE + EXTRA:
        qs_warm[name](spark, warm_dir).collect()
    for name in MODEL_TIER:
        getattr(entrymod, f"q_{name}")(spark, warm_dir).collect()
    # Drop the warmup residue before anything is timed: ~180 warm
    # queries leave one live cache generation per operator scope plus
    # the warm-dir fixture checkpoints in block-manager memory, and
    # that pile-up (not the plans) is what inflated in-suite slots to
    # 15x their isolation numbers in r5 (BENCH_DETAIL vs
    # tools/isolate_timing.py). Codegen caches are JVM-wide and
    # survive; only storage blocks are released.
    from memfuse_spark import cache as _cache

    _cache.release_all()
    entrymod.release_memo_stores(spark, warm_dir)
    spark.catalog.clearCache()
    # the keyword postings index and the graph edge store are persistent
    # ingest-time artifacts (reference: FTS5 index, keyword_store/
    # sqlite_store.py:376-421; graph store built at flush) — built once
    # here, amortized across all keyword/graph queries, not rebuilt per
    # query
    entrymod._postings_index(spark, sf_dir)
    entrymod._graph_edges(spark, sf_dir)
    # served-index side tables (norms + FastSS variants) and the
    # incremental-dedup base state (assignment + LSH signatures) are
    # likewise ingest-time artifacts — built once, so the timed slots
    # measure the per-query serve/merge cost, not a rebuild the system
    # already paid for (r4 VERDICT items 7-9)
    entrymod._postings_index_v2(spark, sf_dir)
    entrymod._dup_base(spark, sf_dir)
    entrymod._dup_assign(spark, sf_dir)
    entrymod._shingle_store(spark, sf_dir)
    # stored hierarchy layers (flush-pipeline artifacts) and the
    # write-time-embedded knowledge corpus — same contract
    entrymod._m1_store(spark, sf_dir)
    entrymod._m2_store(spark, sf_dir)
    entrymod._knowledge_corpus(spark, sf_dir)
    entrymod._knowledge_postings(spark, sf_dir)
    # lifecycle-store builds (compacted v2 index, bucketed vector
    # store, streaming index): build/append/compact is ingest-time work
    # a live service pays at flush, not per query — charge it to the
    # fixture block (timed separately, reported as fixture_builds) so
    # the index_compact / ann_store_lifecycle / bm25_stream_index slots
    # time the SERVE path (VERDICT r6 #6; the dup_clusters_inc split
    # from r5)
    # r10 additions to the fixture block, SAME contract as stream_index
    # (the slots were added after the r6 split and missed it — their
    # pre-split numbers are in BENCH_r09/BENCH_DETAIL history and
    # OPTIMIZATION_r10.md): the vector stream store (_vec_stream_store,
    # the _stream_index twin) and the incremental kNN store's
    # build+append (_knn_inc_store). knn_store_append / ann_stream_store
    # now time the SERVE path; build/append cost stays visible in
    # fixture_builds and the decade probes (tools/knn_append_probe.py).
    fixture_builds: dict[str, float] = {}
    for fixture_name, builder in (
        ("postings_index_c", entrymod._postings_index_c),
        ("bucketed_store_lc", entrymod._bucketed_store_lc),
        ("stream_index", entrymod._stream_index),
        ("vec_stream_store", entrymod._vec_stream_store),
        ("knn_inc_store", entrymod._knn_inc_store),
        # the bounded-degree kNN edge store (r10 build round) missed the
        # same split: it is a persistent src-bucketed warehouse table
        # built once at ingest (graph.build_knn_edges_store), but the
        # first kNN-graph slot in EXTRA order (knn_edges_store) was
        # paying the build per run. Build cost stays visible here and in
        # the decade probes; the six knn_graph_* slots now time SERVE.
        ("knn_edges_store", entrymod._knn_graph_edges),
    ):
        t0 = time.perf_counter()
        builder(spark, sf_dir)
        fixture_builds[fixture_name] = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE + EXTRA + MODEL_TIER:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None
        # per-slot scope hygiene (NOT timed): each query's scoped cache
        # generation is per-call state — releasing it keeps slot N+30
        # from paying for slot N's persisted blocks. The memoized
        # ingest-time stores at sf_dir are plain localCheckpoints held
        # by module memos, untouched here — serving stays amortized.
        _cache.release_all()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query detail goes to a FILE (and an early log line): the
    # driver records only the TAIL of stdout, and a 90+-entry queries
    # dict overflows that cap and truncates the JSON line from the
    # front (BENCH_r03 "parsed": null). The LAST line stays compact —
    # headline per-query timings + a rollup of the extra suite — so the
    # driver always parses it.
    # BENCH_DETAIL.json carries the RUN BAND, not just the last sample
    # (VERDICT r7: host variance on this box is ±45%, so a single-run
    # artifact can't answer a regression question without git
    # archaeology): a rolling history of the last few runs plus a
    # per-slot min/median/max band across the retained same-SF runs.
    # Every run gets a run_id, echoed on BOTH stdout JSON lines, so a
    # driver BENCH_r{N} row is attributable to its exact run.
    run_id = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    prior_runs: list[dict] = []
    try:
        with open(detail_path) as fh:
            prior = json.load(fh)
        prior_runs = prior.get("runs") or []
        if not prior_runs and prior.get("queries"):
            # migrate a pre-band artifact: keep its sample as one run
            prior_runs = [{
                "run_id": "pre-band",
                "sf": prior.get("sf"),
                "queries": prior["queries"],
                "fixture_builds": prior.get("fixture_builds", {}),
            }]
    except (OSError, ValueError):
        pass
    this_run = {
        "run_id": run_id,
        "sf": sf_val,
        "queries": timings,
        "fixture_builds": fixture_builds,
        "headline_total": round(sum(timings[n] for n in HEADLINE), 3),
    }
    runs = (prior_runs + [this_run])[-6:]  # rolling window of runs
    same_sf = [r for r in runs if r.get("sf") == sf_val]
    band: dict[str, dict] = {}
    for name in timings:
        vals = sorted(
            r["queries"][name] for r in same_sf if name in r.get("queries", {})
        )
        band[name] = {
            "min": vals[0],
            "med": vals[len(vals) // 2],
            "max": vals[-1],
            "n": len(vals),
        }
    # self-describing contention flag: slots where THIS run exceeded 2x
    # the PRIOR-runs median (and by > 1s absolute, so job-floor noise
    # on sub-second slots doesn't trip it). Prior runs only — a median
    # that includes this run's own sample would self-mask exactly the
    # contended runs the key exists to explain. The documented broad
    # host-contention signature is many unrelated slots inflating
    # together (run 20260816T054432Z: 12 slots at +4..20s) — a reader
    # of a bad driver sample should see WHICH slots, from the artifact
    # alone.
    prior_same_sf = [r for r in prior_runs if r.get("sf") == sf_val][-5:]
    outliers = {}
    for name, t in timings.items():
        vals = sorted(
            r["queries"][name]
            for r in prior_same_sf
            if name in r.get("queries", {})
        )
        if len(vals) < 2:
            continue
        med = vals[len(vals) // 2]
        if t > 2 * med and t - med > 1.0:
            outliers[name] = {"this_run": t, "prior_med": med}
    detail = {
        "metric": "full_suite_detail",
        "unit": "sec",
        "run_id": run_id,
        "queries": timings,
        "fixture_builds": fixture_builds,
        "sf": sf_val,
        "band": band,
        # named for what it is computed against: the PRIOR-runs median
        # (excluding this run — see the comment above), which can
        # legitimately differ from band[name].med (which includes this
        # run's sample)
        "outliers_vs_prior_med": outliers,
        "requires": SLOT_REQUIRES,
        "runs": runs,
    }
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    # the early log line stays band-free (stdout size discipline)
    print(json.dumps({k: detail[k] for k in
                      ("metric", "unit", "run_id", "queries",
                       "fixture_builds", "sf")}))
    out = {
        "metric": "headline_suite_total_runtime",
        "value": round(sum(timings[n] for n in HEADLINE), 3),
        "unit": "sec",
        "run_id": run_id,
        "queries": {n: timings[n] for n in HEADLINE},
        "extra_total": round(sum(timings[n] for n in EXTRA), 3),
        "n_extra": len(EXTRA),
        "model_tier": {n: timings[n] for n in MODEL_TIER},
        "sf": sf_val,
        # >0 here means read this sample against BENCH_DETAIL.json's
        # band before calling anything a regression
        "n_outliers_vs_prior_med": len(outliers),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
