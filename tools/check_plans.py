#!/usr/bin/env python3
"""Plan-shape gate over Explain's machine-readable audit.

Usage:
  sbt "runMain graft.Explain /root/testdata/sf0.01 /tmp/explains.txt"
  python3 tools/check_plans.py /tmp/explains.txt.audit.json

Contract (SURVEY §5):
  - ZERO CartesianProduct anywhere;
  - BroadcastNestedLoopJoin only in the documented intentional classes
    (all-pairs ANN kernels and one-row stats/totals broadcasts) —
    the allowlist below names them; a NEW query acquiring a BNLJ fails
    until it is consciously added here with a reason;
  - at most MAX_SCANS parquet scans per compiled plan (the shared-
    subtree re-compilation class: a composite that re-derives the
    corpus scan per consumer reads 100 TB N times at scale — r11's
    q_canary_exposure compiled to 36 scans before its bounded
    intermediates were materialized). Queries legitimately above the
    ceiling (multi-table TPC-H joins, multi-arm fusion queries) are
    allowlisted with a reason;
  - at most MAX_BUILD_RECORDS input records read during query
    CONSTRUCTION (r13: Explain's build_records — the jobs that run
    while a frame is built are exactly the localCheckpoint / park /
    driver-fold materializations that then VANISH from the compiled
    plan, so the scan ceiling alone could be defeated by checkpointing
    a data-sized subtree; r12's q_canary_exposure reported 0 scans
    while reading the corpus twice at checkpoint time). Numbers are
    sf0.01-scale (the audit SF). Declared heavy builders (iterative
    graph/LM fits, parked posting tables) are allowlisted at ~2x their
    measured fresh-build volume;
  - no query's explain may fail.
Exit 1 on any violation.
"""
import json
import sys

# Ceiling on `Scan parquet` occurrences in one compiled plan. The gate
# catches the re-compilation class, not table count: a 6-table TPC-H
# join with two scans each sits at 12; a composite re-deriving one
# corpus scan 20-30x is the defect.
MAX_SCANS = 12

# Queries allowed to exceed MAX_SCANS, with the reason (judge-audited
# shapes: every scan is a DIFFERENT table or a deliberate bounded arm,
# not an accidental re-compilation of a data-sized subtree).
SCANS_ALLOWED = {
    "q_ann_ivfpq": 20,           # IVF probe + PQ codebook arms over embeddings (codebook passes are sample-bounded)
    "q_dedup_levenshtein": 20,   # hierarchical blocking: 3 blocking tiers + verify, each over documents
    "q_ann_lsh": 16,             # hash-table build + probe arms over embeddings
    "q_batch_mix": 16,           # shuffle-position + composition + corpus-share arms over documents
    "q_dedup_cross": 16,         # cross-source mine: per-side blocking + verify
    "q_drift_psi": 16,           # per-window histogram arms (4 windows x expected/actual)
    "q_isotonic_calibration": 16,# score-bin + PAV minimax arms (bin-bounded frames)
    "q_perplexity_ablation": 16, # LM-stats per ablation cut (each cut one corpus pass)
    "q_market_share": 14,        # TPC-H Q8: 7-table join, two scans each side of the year split
    "q_waiting_suppliers": 14,   # TPC-H Q21: 4-table join + two lineitem self-join arms
}

# Ceiling on input records read while CONSTRUCTING one query at the
# sf0.01 audit scale (events = 10k, lineitem = 60k, documents = 500).
# Legit bounded builds (memoized-index first build, driver folds,
# sampled fits) sit well under this; a data-sized subtree silently
# re-read N times behind a checkpoint blows straight through it.
MAX_BUILD_RECORDS = 12_000

# Declared heavy builders: measured fresh-build volume x ~2 headroom,
# each a bounded iterative fit or an audited park, not a hidden
# re-compilation.
#
# ORDER DEPENDENCE: Explain walks queries alphabetically, and the
# shared memoized indexes (IVF / PQ / NN-graph / inverted index /
# dedup parks) are built by the FIRST query alphabetically that needs
# them — later sharers hit the tmpdir marker and report ~0 build
# records. Renaming or adding a query that shares an index shifts
# which entry absorbs the build volume; if the gate flips after a
# rename with no code change, re-measure the fresh-build volume for
# the new first-alphabetical owner instead of assuming a regression.
BUILD_ALLOWED = {
    "q_ann_graph": 70_000,     # NN-descent rounds over checkpointed bounded edge lists
    "q_ann_graph_hr": 70_000,  # same fit at the high-recall ef point
    "q_suggest_phrase": 50_000,  # inverted-index ensure-build (vocabulary + bigram tables)
    "q_graph_explore": 45_000,   # bounded hop-expansion loop (per-round checkpoints)
    "q_pagerank": 45_000,        # fixed-round power iteration over the service graph
    "q_outlier_scores": 40_000,  # stride sample collect + forest fit (2 bounded event passes)
    "q_dedup_candidates": 25_000,  # parked posting table + bucket aggregate (E20e audit)
    "q_dedup_substring": 25_000,   # fixpoint removal rounds (bounded per-round parks)
}

# Queries allowed to contain BroadcastNestedLoopJoin, with the reason.
# One-row stats/totals broadcasts are O(1)-side joins; all-pairs ANN
# kernels are the documented brute-force baselines.
BNLJ_ALLOWED = {
    "q_ann_topk": "all-pairs brute-force baseline",
    "q_ann_topk_agg": "all-pairs brute-force baseline",
    "q_hard_negatives": "bounded anchor-set broadcast (E6 brute-force class)",
    "q_ann_bq": "code-scan hamming coarse pass (quantized brute-force class)",
    "q_ann_ivf": "probe x cell-subset kernel",
    "q_ann_filtered": "filtered brute-force kernel",
    "q_ann_radius": "radial kernel",
    "q_ann_sq": "quantized coarse pass",
    "q_ann_lsh": "bucket-probe kernel",
    "q_dedup_embedding": "blocked-pairs cosine verify",
    "q_dedup_semantic": "cell-bounded pair verify",
    "q_anomaly_days": "one-row stats broadcast",
    "q_kn_bigram": "one-row distinct-bigram total broadcast (r14: the "
                   "separate driver count() action folded into the plan)",
    "q_sig_terms": "one-row totals broadcast",
    "q_sig_text": "one-row totals broadcast",
    "q_tfidf_terms": "one-row stats broadcast",
    "q_search_ranked": "one-row stats broadcast",
    "q_freq_items": "one-row totals broadcast",
    "q_rescore": "one-row cutoff broadcast",
    "q_explain_score": "one-row stats broadcast",
    "q_multi_match": "one-row stats broadcast",
    "q_multi_match_cross": "one-row stats broadcast",
    "q_dis_max": "one-row stats broadcast",
    "q_boosting": "one-row stats broadcast",
    "q_function_score": "one-row stats broadcast",
    "q_search_fuzzy": "small candidate-term nest",
    "q_more_like_this": "one-row stats broadcast",
    "q_ks_test": "one-row totals broadcast",
    "q_bucket_correlation": "one-row totals broadcast",
    "q_rolling_distinct": "bounded day-window nest",
    "q_rolling_distinct_approx": "bounded day-window nest",
    "q_curriculum_order": "broadcast quantile cuts",
    "q_terms_shard_error": "one-row bound broadcast",
    "q_suggest_fuzzy": "small candidate-term nest",
    "q_suggest_phrase": "small candidate-term nest",
    "q_search_hybrid": "one-row fusion-stats broadcast",
    "q_search_hybrid_norm": "one-row min/max broadcast",
    "q_quality_calibration": "one-row threshold broadcast",
    "q_contamination_embedding": "benchmark-side broadcast kernel",
    "q_dedup_sweep": "one-row floor broadcast",
    "q_compression_ratio": "one-row corpus-stats broadcast",
    "q_lang_mismatch": "one-row stats broadcast",
    "q_perplexity_buckets": "one-row cuts broadcast",
    "q_bigram_logprob": "one-row vocab-size broadcast",
    "q_unigram_logprob": "one-row vocab-size broadcast",
    "q_importance_resample": "one-row vocab-size broadcast",
    "q_domain_reweight": "one-row ref/Z broadcasts",
    "q_vocab_coverage": "one-row totals broadcast",
    "q_fertility_table": "one-row totals broadcast",
    "q_dataset_card": "one-row corpus totals broadcast",
    "q_drift_psi": "one-row totals broadcast",
    "q_embed_drift": "one-row centroid broadcast",
    "q_corpus_stats": "one-row totals broadcast",
    "q_boilerplate_ngrams": "one-row totals broadcast",
    "q_ngram_diversity": "one-row totals broadcast",
    "q_burn_rate": "one-row now_ts broadcast",
    "q_track_total_hits": "single-row result literal",
    "q_auto_date_histogram": "one-row span-stats broadcast",
    "q_autocorrelation": "one-row N/S totals broadcast",
    "q_change_point": "one-row series-totals broadcast",
    "q_frequent_itemsets": "bounded frequent-item list broadcast",
    "q_histogram_varwidth": "one-row cut-points broadcast",
    "q_important_parts": "one-row threshold broadcast (TPC-H Q11)",
    "q_normalize": "one-row min/max broadcast",
    "q_rank_eval": "bounded judgment-list broadcast",
    "q_sales_opportunity": "one-row avg-balance broadcast (TPC-H Q22)",
    "q_string_stats": "one-row corpus-totals broadcast",
    "q_cell_audit": "one-row corpus-total broadcast",
    "q_perplexity_ablation": "one-row LM-stats broadcast per cut",
    "q_combined_fields": "one-row BM25F-stats broadcast",
    "q_match_bool_prefix": "one-row BM25-stats broadcast",
    "q_pinned": "one-row BM25-stats broadcast (both arms)",
    "q_neural_sparse": "one-row n_docs broadcast into the weight projection",
    "q_kn_perplexity": "one-row bigram-type-total broadcast",
    "q_theta_sketch": "one-row sketch-state x one-row exact-intersection join",
    "q_anneal_mix": "one-row corpus-totals + hq-totals broadcasts",
    "q_matryoshka": "documented brute-force baseline: 10-query broadcast x corpus (the E6 class), both in the sweep and its dim-64 base replica",
    "q_maxsim_rerank": "9-row query-token broadcast x distinct doc tokens (posting-traversal contract)",
    "q_kanonymity": "one-row total-rows broadcast",
    "q_ann_ivfpq": "queries x nCells centroid broadcast (probe selection, the ann_ivf class)",
    "q_heaps_law": "one-row log-log fit broadcast (the corpus_stats slope class)",
    # r11 adjudication of the five late-r10 queries (judge-confirmed
    # one-row Cross BuildRight shapes; none grows with data):
    "q_ltr": "one-row BM25-stats broadcasts + k=20-bounded candidate list "
             "broadcast (Ltr.scala:42-50; the search_ranked class)",
    "q_rag_context": "single-query-row broadcast x corpus scoring (the E6 "
                     "brute-force class; assembly after it is O(k) rows)",
    "q_anomaly_localization": "one-row daily-stats broadcast "
                              "(EventCorrelation.scala:256-258)",
    "q_ldiversity": "one-row customer-total broadcast (Curation.scala:1719)",
    "q_shard_manifest": "one-row token-total broadcast over nShards=16 rows "
                        "(Curation.scala:1773)",
    "q_dedup_candidates": "one-row bucket-stats and pair-stats broadcasts "
                          "crossed into the one-row summary (E20e audit; "
                          "every side is a single-row aggregate)",
    # r11 batch 2 (E114/E115/E118):
    "q_zipf_law": "one-row OLS-fit broadcast over the 64-row vocabulary "
                  "head (the heaps_law class)",
    "q_source_jsd": "one-row grand-total broadcast (the corpus_stats "
                    "class; the vocab margin join is equi-keyed)",
    "q_knn_label": "bounded 25-row to-label batch broadcast x labeled "
                   "corpus (the E6 brute-force class; full-corpus "
                   "labeling routes through IVF probes instead)",
    "q_canary_exposure": "bounded 8x64 canary-vs-reference rank nest + "
                         "8-row canary-text broadcast (E119; both sides "
                         "fixed-size audit sets)",
    "q_batch_mix": "one-row grand-total broadcast (the corpus_stats "
                   "class)",
    "q_rho_select": "one-row corpus-totals broadcast (the doremi class)",
    # q_jm_interpolation needs no entry: its EM folds collect during
    # construction, so the returned frame is a LocalTableScan.
    "q_good_turing": "one-row totals + N1/N2 broadcasts over the <=10-row "
                     "count-of-counts frame (corpus_stats class)",
    "q_burstiness": "one-row doc-count broadcast (corpus_stats class)",
    "q_isotonic_calibration": "one-row totals broadcast + bin-bounded "
                              "minimax nests (20-row frames; the PAV "
                              "closed form's j<=i<=k joins)",
    "q_benford": "one-row total broadcast over the 9-row digit frame "
                 "(corpus_stats class)",
    "q_trend_robust": "calendar-bounded ~80-row month-pair nest + one-row "
                      "S/N/tie broadcasts (Mann-Kendall pair frame)",
    "q_eb_shrinkage": "one-row prior-moment broadcasts over the "
                      "|sources|-row frame (corpus_stats class)",
    "q_gini_lorenz": "one-row totals broadcast over the 10-row decile "
                     "frame (corpus_stats class)",
    "q_winsorized_stats": "one-row percentile-bounds broadcast "
                          "(corpus_stats class)",
    "q_label_confusion": "inherits E118's bounded 25-row batch broadcast "
                         "(the E6 class; the audit itself adds no nest)",
}


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    with open(sys.argv[1]) as f:
        audit = json.load(f)
    bad = []
    for name, a in sorted(audit.items()):
        if a.get("failed"):
            bad.append(f"{name}: EXPLAIN FAILED")
        if a.get("cartesian", 0) > 0:
            bad.append(f"{name}: {a['cartesian']} CartesianProduct")
        if a.get("bnlj", 0) > 0 and name not in BNLJ_ALLOWED:
            bad.append(f"{name}: {a['bnlj']} BroadcastNestedLoopJoin "
                       "not in the documented allowlist")
        limit = SCANS_ALLOWED.get(name, MAX_SCANS)
        if a.get("scans", 0) > limit:
            bad.append(f"{name}: {a['scans']} parquet scans exceeds "
                       f"ceiling {limit} (shared-subtree re-compilation? "
                       "materialize the bounded intermediate or allowlist "
                       "with a reason)")
        blimit = BUILD_ALLOWED.get(name, MAX_BUILD_RECORDS)
        if a.get("build_records", 0) > blimit:
            bad.append(f"{name}: {a['build_records']} records read at "
                       f"construction exceeds ceiling {blimit} "
                       "(data-sized subtree materialized behind a "
                       "checkpoint/park? bound it or allowlist with a "
                       "reason)")
    stale = sorted(set(BNLJ_ALLOWED) - set(audit))
    if stale:
        print(f"note: {len(stale)} BNLJ-allowlisted queries absent from audit: "
              f"{', '.join(stale[:5])}{'...' if len(stale) > 5 else ''}")
    stale_scans = sorted(set(SCANS_ALLOWED) - set(audit))
    if stale_scans:
        print(f"note: {len(stale_scans)} scan-allowlisted queries absent from "
              f"audit: {', '.join(stale_scans[:5])}"
              f"{'...' if len(stale_scans) > 5 else ''}")
    stale_build = sorted(set(BUILD_ALLOWED) - set(audit))
    if stale_build:
        print(f"note: {len(stale_build)} build-allowlisted queries absent from "
              f"audit: {', '.join(stale_build[:5])}"
              f"{'...' if len(stale_build) > 5 else ''}")
    for b in bad:
        print("VIOLATION " + b)
    n_bnlj = sum(1 for a in audit.values() if a.get("bnlj", 0) > 0)
    if bad:
        print(f"== {len(bad)} plan violation(s) over {len(audit)} queries ==")
        return 1
    print(f"== plans clean: {len(audit)} queries, 0 CartesianProduct, "
          f"{n_bnlj} BNLJ all allowlisted ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
