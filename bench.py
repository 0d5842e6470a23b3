"""Headline benchmark. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, "turns_per_sec": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     BENCH_CONVS        (override transcript corpus size).

The flagship query is the transcript extraction (the BASELINE.json metric =
turns/sec); the rest are headline analytics over the driver tables. The
transcript corpus is generated once per (sf, convs) and cached under /tmp.
A warm-up extraction runs first so Python-worker import cost doesn't land
in the measurement (it is one-time per executor in a real deployment).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _ensure_corpus(sf: float, n_convs: int) -> str:
    from fixtures.gen_corpus import GEN_VERSION
    path = f"/tmp/bds_bench_corpus_v{GEN_VERSION}_sf{sf}_c{n_convs}"
    marker = os.path.join(path, "transcripts.parquet")
    if not os.path.exists(marker):
        from fixtures.gen_corpus import gen_transcripts_parallel
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        df = gen_transcripts_parallel(n_convs)
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(marker, index=False)
    return path


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    # corpus size scales with sf: sf0.1 → ~58k turns, sf0.01 → ~7.5k
    default_convs = {0.001: 20, 0.01: 50, 0.1: 400}.get(sf, 400)
    n_convs = int(os.environ.get("BENCH_CONVS", default_convs))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    corpus = _ensure_corpus(sf, n_convs)

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from bella_domify_spark.engine.extract import extract_transcripts
    from bella_domify_spark.engine.manifest import run_resumable
    from bella_domify_spark.engine.session import build_session

    spark = build_session(app_name="bella-domify-bench", cores=cpus,
                          shuffle_partitions=max(cpus, 8))

    tdf = spark.read.parquet(f"{corpus}/transcripts.parquet").cache()
    n_turns = tdf.count()

    # warm up ALL python workers + parse/sink codegen (one-time cost per
    # executor in a real deployment; repartition spreads the warmup rows
    # over every core)
    warm_dir = f"/tmp/bds_bench_warm_{os.getpid()}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    run_resumable(tdf.limit(cpus * 64), warm_dir, n_buckets=cpus,
                  partitions=cpus)
    shutil.rmtree(warm_dir, ignore_errors=True)

    timings: dict[str, float] = {}
    attempts: dict[str, list] = {}

    # ---- host-noise self-adjudication (VERDICT r5 task 2) ----
    # a fixed-work pure-Python probe (no Spark, single thread) timed
    # before the suite, after it, and every PROBE_EVERY timed queries:
    # identical work each time, so any swing is the host, not the plan.
    # BENCH_rN.json carries the raw per-query attempts + this probe
    # timeline, making a contaminated stretch machine-readable.
    probe_texts = [r["text"] for r in
                   tdf.select("text").limit(64).collect()]
    probe_timeline: list = []

    def probe(tag):
        from bella_domify_spark.parsers.dispatch import parse_payload
        t0 = time.monotonic()
        s = 0
        for t in probe_texts:
            s += len(parse_payload(t)["extracted_text"])
        probe_timeline.append(
            {"at": tag, "sec": round(time.monotonic() - t0, 4)})
        return s

    probe("warmup")  # first call pays imports; discard via tag
    probe("before_suite")

    PROBE_EVERY = 8
    _n_timed = [0]

    def timed(name, fn, runs=1):
        """Record the BEST of ``runs`` executions (plus ALL raw attempts
        in the JSON). Run 1 pays one-time whole-stage-codegen compilation
        (amortizes to zero at production scale) and this shared host
        shows 2-10x load spikes on identical runs with zero local
        processes — best-of-N is the same statistic BENCH/BASELINE.md
        uses, measuring what the plan can sustain."""
        raw = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            raw.append(round(time.monotonic() - t0, 3))
        timings[name] = min(raw)
        attempts[name] = raw
        _n_timed[0] += 1
        if _n_timed[0] % PROBE_EVERY == 0:
            probe(f"after_{name}")

    # flagship: full extraction incl. salted shuffle + checkpointed sink
    out_dir = f"/tmp/bds_bench_out_{os.getpid()}"

    def run_pipeline():
        shutil.rmtree(out_dir, ignore_errors=True)
        run_resumable(tdf, out_dir, n_buckets=max(cpus * 2, 16),
                      partitions=cpus)

    timed("extract_pipeline", run_pipeline, runs=3)
    shutil.rmtree(out_dir, ignore_errors=True)

    # extraction compute only (no sink) — pure parse throughput
    timed("extract_compute", lambda: extract_transcripts(
        tdf, partitions=cpus).selectExpr(
        "sum(length(extracted_text))").collect(), runs=3)

    tdf.unpersist()  # free executor memory before the analytics queries

    qs = entrymod.queries()
    # the heavy hash/vector queries have shown 2-10x host-contention spikes
    # that can survive best-of-2 (BENCH_r02's dedup_minhash_lsh pinned a
    # contaminated 8.4s for a 1.6s plan) — give every query 3 attempts and
    # the contention-prone ones a fourth; BENCH_RUNS_EXTRA adds more
    bonus = int(os.environ.get("BENCH_RUNS_EXTRA", "0"))
    extra = {"dedup_minhash_lsh", "simhash", "dedup_embedding",
             "ann_ivf_topk", "fuzzy_decontaminate"}
    for name in ["q1_pricing_summary", "top_revenue_orders", "window_topk_orders",
                 "dedup_exact", "dedup_minhash_lsh", "dedup_embedding",
                 "simhash", "doc_quality", "ann_cosine_topk", "ann_ivf_topk",
                 "token_counts", "pdflike_extract", "pdflike_extract_stream",
                 "asof_view_attribution", "bigram_surprisal", "cms_heavy_hitters",
                 "approx_distinct_hll", "layout_ocr_text", "tfidf_keywords",
                 "gopher_quality", "hist_event_quantiles", "dup_span_stats",
                 "mix_weights", "tool_run_stats", "tool_latency",
                 "bm25_topk", "chunk_docs",
                 "cross_surprisal", "remove_dup_spans", "kmeans_assign",
                 "merge_upsert", "quality_classifier", "zorder_layout",
                 "incremental_view_update", "dsir_weights",
                 "pagerank_dedup", "analyze_table_stats",
                 "retention_cohorts", "embedding_outliers",
                 "hard_negatives", "scd2_history", "psi_drift",
                 "classifier_auc", "hll_sliding_distinct",
                 "ab_conversion_chi2", "event_trigrams",
                 "cuped_adjusted", "triangle_stats",
                 "compact_files", "standard_images",
                 "hybrid_rrf", "skew_report", "semdedup",
                 "vacuum_candidates", "bpe_merges", "turn_revisions",
                 "time_travel_read", "file_prune_stats", "late_data_stats",
                 "corpus_boilerplate", "kcore_peel", "bpe_encode",
                 "pq_codes", "ivfpq_topk", "pmi_pairs", "snapshot_diff",
                 "concurrency_stats", "anomaly_mad", "bm25_prf",
                 "walk_centrality", "fuzzy_decontaminate",
                 "link_prediction",
                 # round-6 session-3/4/5 queries (first-bench floors):
                 "split_by_cluster", "quantile_effects",
                 "boilerplate_strip", "containment_pairs",
                 "calibration_bins", "position_deletes",
                 "cooccurrence_pairs", "srm_check",
                 "expectations_report", "retrieval_eval",
                 "flesch_reading", "source_modularity",
                 "dim_ablation", "split_leakage",
                 "c4_filters", "encoding_report", "secrets_detect",
                 # round-6 session-6 queries (first-bench floors):
                 "lexical_diversity", "k_anonymity", "rater_kappa",
                 "rank_rbo", "context_budget", "sq_error",
                 # round-6 session-7/8 queries (first-bench floors):
                 "gini_concentration", "mann_kendall", "heaps_law",
                 "lev_verify", "interarrival_stats", "cusum_changepoint",
                 "script_mix", "source_temperature", "l_diversity",
                 "winnow_fingerprints", "lpa_communities",
                 "neighborhood_sizes", "t_closeness", "char_entropy",
                 "negative_sampling", "fertility_by_lang",
                 "ks_drift", "ess_by_source", "benford_audit",
                 "zipf_fit",
                 # round-6 session-9 queries (first-bench floors):
                 "ppjoin_pairs", "theil_sen", "vocab_overlap",
                 "hill_tail", "freq_spectrum", "transition_entropy",
                 "cross_source_dups", "length_fences", "meta_mi",
                 "kcenter_coreset", "props_keys",
                 "blocking_quality", "reshard_stats",
                 "pareto_users", "type_affinity",
                 "q5_local_supplier", "returned_revenue",
                 "ivf_balance", "shard_balance",
                 "weekday_profile", "conversion_lag",
                 "manifest_stats", "tool_latency_tail",
                 "bottomk_estimate", "postings_compression",
                 "apportion_sample", "assortativity",
                 "cluster_label_mi", "conformal_threshold",
                 "vocab_delta", "survival_curve",
                 "trimmed_mean", "spearman_lq",
                 "dedup_savings", "source_jsd"]:
        fn = qs[name]
        timed(name, lambda f=fn: f(spark, sf_dir).write.format("noop")
              .mode("overwrite").save(),
              runs=(4 if name in extra else 3) + bonus)

    probe("after_suite")
    probe_secs = [p["sec"] for p in probe_timeline if p["at"] != "warmup"]
    probe_floor = min(probe_secs)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / timings["extract_pipeline"], 1),
        "turns_per_sec_compute": round(n_turns / timings["extract_compute"], 1),
        "cpus": cpus,
        # self-adjudication: identical-work probe swings flag host
        # contention windows; raw attempts expose which queries were hit
        "attempts": attempts,
        "probe_timeline": probe_timeline,
        "probe_max_over_floor": round(max(probe_secs) / probe_floor, 2),
        "contaminated_probes": [p["at"] for p in probe_timeline
                                if p["at"] != "warmup"
                                and p["sec"] > 1.5 * probe_floor],
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
