#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a count() (full plan execution, no
driver collect of payloads), run $SPARK_GRAFT_BENCH_RUNS times
(default 3), and reported as the MEDIAN; the headline value is the
sum of medians.  A warmup pass amortizes JVM/session startup out of
the numbers.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import __spark_entry__ as entrymod
from cdp_spark.session import get_spark, load_table

BENCH_QUERIES = [
    # relational
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "top_customers",
    "join_semi",
    "join_anti",
    "agg_rollup",
    "agg_cube",
    "topk_per_group",
    "sort_limit",
    "window_running_funcs",
    "avg_subquery_join",
    "range_join_events",
    "percentiles",
    "min_cost_supplier",
    "large_orders",
    "order_priority_exists",
    "rich_inactive_customers",
    # relational breadth pack (round 6)
    "q6_revenue_change",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_shipments",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q19_disjunctive_revenue",
    "q13_customer_distribution",
    # relational completion pack (round 7): the four remaining TPC-H
    # shapes (q11/q17/q20/q21 adaptations)
    "q11_important_stock",
    "q17_small_qty_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "window_nav_funcs",
    "zscore_outliers",
    "triangle_count_nations",
    # CDP semantics
    "pattern_match_composite",
    "window_reduce_agg",
    "window_flatmap_slide",
    "window_reduce_keyed",
    "window_flatmap_keyed",
    "dedup_exact_events",
    "keep_when_filter",
    "asof_join",
    "count_or_time_sessions",
    "session_gap",
    # LLM-pipeline
    "dedup_exact_docs",
    "text_stats",
    "lang_id",
    "langid_ngram_confusion",
    "langid_ngram_separation",
    "token_count_by_source",
    "fingerprint_docs",
    "hll_distinct_users",
    "cms_heavy_users",
    "approx_quantiles_value",
    "quantiles_by_type",
    "bloom_filter_parts",
    "ann_bruteforce",
    "minhash_pairs",
    "near_dup_verified",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "simhash_docs",
    "ann_lsh",
    "ann_ivf",
    "dup_clusters",
    "near_dedup_corpus",
    "minhash_dedup_corpus",
    "incremental_dedup",
    "exact_substring_pairs",
    "exact_substring_dedup",
    "exact_ngram_dedup",
    "exact_ngram_clean",
    "exact_ngram_clean_text",
    "exact_ngram_index_clean",
    "fold_incremental_dedup",
    "fold_substring_flags",
    "auto_fold_lifecycle",
    "auto_exact_ngram_lifecycle",
    "stratified_sample",
    "dataset_mix",
    "temperature_mix",
    "token_budget_sample",
    "decontaminate_docs",
    "contamination_score",
    "token_kl_drift",
    "bm25_top_docs",
    "bm25_multi_query",
    "bm25_passages",
    "bm25_index_fold",
    "stream_bm25_ingest",
    "stream_ivf_ingest",
    "ivf_refit_lifecycle",
    # round 13: shard writer layout, ANN accuracy eval, capped
    # adversarial multiband
    "shard_shuffle",
    "ann_recall_eval",
    "near_dup_multiband_capped",
    "ivf_refit_recall",
    # round 14: recall-floor serving lifecycle, PQ refine stage,
    # quality-aware survivorship
    "ivf_recall_refit_lifecycle",
    "ann_ivf_pq_refine",
    "dedup_keep_best",
    "resample_ffill_events",
    "ngram_containment_pairs",
    "minhash_band_plan",
    "pack_documents",
    "vocabulary",
    "boilerplate_spans",
    "chunk_tokens",
    "doc_repetition",
    "ngram_novelty",
    "gopher_quality",
    "c4_quality",
    "dedup_lines_docs",
    "clean_corpus_e2e",
    "perplexity_buckets",
    "edit_distance_near_dup",
    "pii_redact",
    "jq_window_stats",
    "jsonnet_window_stats",
    "pipeline_template_e2e",
    # analytics (round 5)
    "cohort_retention",
    "funnel_steps",
    "value_histogram",
    "tfidf_top_terms",
    "embedding_centroids",
    "pareto_customers",
    "hopping_window_agg",
    "embedding_near_dup",
    "embedding_near_dup_multiband",
    "hard_negatives",
    "kmeans_centroids",
    "unigram_logprob",
    "bigram_logprob",
    "pmi_collocations",
    "bpe_merges",
    "bpe_production_merges",
    "bpe_token_counts",
    "bpe_fertility",
    "ann_ivf_kmeans",
    "ann_ivf_kmeans_indexed",
    "rolling_active_users",
    "stream_quality_gate",
    "stream_gopher_gate",
    # round 6: graph / sampling / semantic dedup / sketch merge
    "semantic_dedup",
    "embedding_outliers",
    "weighted_sample",
    "leakage_safe_split",
    "pagerank_nations",
    "hll_union_entities",
    "hll_overlap_segments",
    "hll_users_by_type",
    "rollup_reaggregate",
    "oov_rate",
    "dsir_sample",
    "training_corpus_e2e",
    # persisted-index reads (build happens once in warmup; the timed
    # query is the partition-pruned scan — the 100 TB access path)
    "ann_lsh_indexed",
    "ann_ivf_indexed",
    "ann_pq",
    "ann_ivf_pq_indexed",
]

# Coverage pack (r15 — VERDICT r14 #4): every remaining registered
# query appends in registry order, so EVERY queries() entry gets a
# recorded sf0.1 number each round — and a future round's new query
# lands in the bench automatically instead of waiting for a
# hand-edit here.  The curated list above keeps its order so
# cross-round bench_compare diffs stay aligned.
BENCH_QUERIES += [
    q for q in entrymod._all_queries() if q not in set(BENCH_QUERIES)
]


def _cpu_info() -> dict:
    """CPU model/MHz/core-count from /proc/cpuinfo (Linux)."""
    info: dict = {"cores_os": os.cpu_count()}
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if ":" not in line:
                    continue
                k, v = (s.strip() for s in line.split(":", 1))
                if k == "model name" and "cpu_model" not in info:
                    info["cpu_model"] = v
                elif k == "cpu MHz" and "cpu_mhz" not in info:
                    info["cpu_mhz"] = float(v)
    except OSError:
        pass
    return info


def _spin_calibration(iters: int = 20_000_000) -> float:
    """Fixed-cost single-core arithmetic spin (seconds).

    A constant amount of pure-Python integer work: its wall time moves
    with CPU speed, frequency scaling, and co-tenant load — NOT with
    any code in this repo — so cross-round bench ratios can be
    normalized by it (VERDICT r7 "what's wrong" #1: an environment
    shift and a diffuse regression were indistinguishable from the
    artifacts alone).
    """
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc = (acc + i * 7) % 1_000_003
    dt = time.perf_counter() - t0
    assert acc >= 0
    return dt


def _pspin_worker(iters: int) -> int:
    acc = 0
    for i in range(iters):
        acc = (acc + i * 7) % 1_000_003
    return acc


def _parallel_spin_calibration(
    nproc: int | None = None, iters: int = 10_000_000
) -> float:
    """Fixed-quantum spin on EVERY core at once (VERDICT r8 "what's
    wrong" #1): N processes — not threads; the GIL would serialize
    them — each run the same integer quantum, and the recorded value
    is the GANG's wall time.  The single-core spin moves with CPU
    speed but is blind to a co-tenant saturating the OTHER cores
    (measured: a loadavg-12 run benched 1.19x slower at identical
    single spin); the parallel gang competes for every core exactly
    like the 32-thread Spark stages do, so multi-core contention
    shows up here or not at all."""
    import concurrent.futures as cf

    n = nproc or os.cpu_count() or 1
    t0 = time.perf_counter()
    with cf.ProcessPoolExecutor(max_workers=n) as ex:
        list(ex.map(_pspin_worker, [iters] * n))
    return time.perf_counter() - t0


def _stream_overhead_calibration(spark, n_batches: int = 6) -> float:
    """Fixed-cost Structured Streaming drive (VERDICT r15 next #8):
    ``n_batches`` single-file micro-batches of a ONE-ROW json stream
    through a memory sink under AvailableNow — no operator work at
    all, so the per-trigger wall time is pure harness (trigger
    scheduling, offset/commit log writes, checkpoint fsyncs).  The
    heavy stream-lifecycle bench rows are dominated by exactly this
    cost; recording it per round lets bench_compare divide it out so
    cross-round stream-query comparisons stop aliasing harness drift
    into operator cost.  Returns seconds per trigger."""
    import shutil as _sh
    import tempfile
    import uuid

    src = tempfile.mkdtemp(prefix="cdp_bench_so_src_")
    ckpt = tempfile.mkdtemp(prefix="cdp_bench_so_ck_")
    base = time.time() - 300
    for k in range(n_batches):
        p = os.path.join(src, f"b{k}.json")
        with open(p, "w") as f:
            f.write('{"x": %d}\n' % k)
        os.utime(p, (base + k, base + k))
    stream = (
        spark.readStream.schema("x long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    name = "cdp_bench_so_" + uuid.uuid4().hex[:8]
    t0 = time.perf_counter()
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError("stream-overhead calibration hung")
    finally:
        if q.isActive:
            q.stop()
    dt = time.perf_counter() - t0
    spark.catalog.dropTempView(name)
    _sh.rmtree(src, ignore_errors=True)
    _sh.rmtree(ckpt, ignore_errors=True)
    return dt / n_batches


def _scan_calibration(spark, sf_dir: str, runs: int = 3) -> float:
    """Fixed-cost Spark work: median count() over the cached lineitem
    table (warmed by main()).  Exercises the JVM/scheduler/executor
    path with a constant plan, so it separates 'Spark got slower on
    this host' from 'a query plan regressed'."""
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        load_table(spark, sf_dir, "lineitem").count()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    host: dict = _cpu_info()
    host["loadavg_start"] = [round(x, 2) for x in os.getloadavg()]
    host["spin_sec_start"] = round(_spin_calibration(), 3)
    host["pspin_procs"] = os.cpu_count() or 1
    host["pspin_sec_start"] = round(_parallel_spin_calibration(), 3)
    spark = get_spark("cdp_spark_bench")

    # Warmup: cache the hot tables.  The testdata parquet files are
    # single-row-group, so a cold scan is one task regardless of
    # cores; caching re-exposes the data as splittable in-memory
    # batches (standard warm-storage benchmarking — the DuckDB oracle
    # likewise reruns over the OS page cache).  Cache lookup is by
    # logical-plan equality, so load_table calls inside queries hit
    # these entries automatically.
    for t in ("lineitem", "orders", "customer", "part", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).cache().count()
    # One-time ANN index builds (indexing cost, not query cost).
    entrymod._ensure_ann_index(spark, sf_dir, "ivf")
    entrymod._ensure_ann_index(spark, sf_dir, "lsh")
    entrymod._ensure_ann_index(spark, sf_dir, "ivfpq")
    entrymod._ensure_ann_index(spark, sf_dir, "ivfkm")
    # One-time shared k-means fit (train once, serve many).  Timed and
    # reported separately as shared_fit.kmeans_fit_sec: the consumer
    # queries' per-query numbers deliberately EXCLUDE training — they
    # measure the serve path, not the Lloyd iterations (ADVICE r6).
    t0 = time.perf_counter()
    entrymod._kmeans_fit_shared(spark, sf_dir)
    kmeans_fit_sec = time.perf_counter() - t0
    # One-time shared BPE training (VERDICT r9 "what's wrong" #4: the
    # fit was cached per process but not declared like the k-means
    # fit).  bpe_token_counts / bpe_fertility measure the tokenize
    # SERVE path; the merge learning they share is timed here.  Note
    # bpe_merges / bpe_production_merges still pay full training in
    # their own numbers — they ARE the training benchmark.
    t0 = time.perf_counter()
    entrymod._bpe_merges_for(spark, sf_dir)
    bpe_fit_sec = time.perf_counter() - t0

    host["scan_sec"] = round(_scan_calibration(spark, sf_dir), 3)
    host["stream_overhead_sec_start"] = round(
        _stream_overhead_calibration(spark), 3
    )

    qs = entrymod.queries()
    # Median of 3 warm runs per query (VERDICT r5 "next round" #2): a
    # single cold run conflates JVM/scheduler startup with query cost —
    # r4/r5 both burned a judge adjudication pass on 2-3x cold-start
    # outliers (dup_clusters 7.9s recorded vs 2.4s warm).  The median is
    # robust to one GC/compile hiccup; total = sum of medians.
    #
    # Runs are PASS-MAJOR (run the whole list, then repeat), not
    # query-major: this VM's noise arrives in multi-second bursts, and
    # back-to-back samples of one query all land inside the same burst
    # (r5 recorded dup_clusters at 7.9s this way, and an r6 query-major
    # pass recorded near_dup_verified at [6.9, 13.0, 6.5] vs ~2.0s solo
    # — every sample hot, median useless).  Interleaved, a burst taints
    # one sample each of several queries, which the per-query median
    # rejects.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for r in range(runs):
        # Drain deferred cleanup OUTSIDE the timed region: dropping the
        # py4j refs lets the ContextCleaner release checkpoint/shuffle
        # blocks accumulated by the previous pass, instead of that work
        # landing inside some victim query's samples.
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
        print(f"# pass {r + 1}/{runs} done", file=sys.stderr, flush=True)
    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        s = samples[name]
        dt = sorted(s)[len(s) // 2]
        timings[name] = round(dt, 3)
        total += dt
        print(
            f"# {name}: median {dt:.3f}s of {[round(x, 3) for x in s]}",
            file=sys.stderr,
            flush=True,
        )

    host["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    host["spin_sec_end"] = round(_spin_calibration(), 3)
    host["pspin_sec_end"] = round(_parallel_spin_calibration(), 3)
    host["stream_overhead_sec_end"] = round(
        _stream_overhead_calibration(spark), 3
    )
    # The printed line carries ONLY the driver contract fields
    # (metric/value/unit/queries/sf) in compact-separator JSON
    # (VERDICT r16 #2: the driver keeps a bounded tail of stdout and
    # r15's round-over-round table was destroyed when the line
    # out-grew it; 226 query names alone need ~5.9 kB so the line
    # cannot fit a 2000-char window, but every byte trimmed widens
    # the margin).  Host calibration and shared-fit telemetry move to
    # the side file, which keeps the complete record.
    line_doc = {
        "metric": "headline_queries_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    # Host telemetry + fixed-cost calibration (VERDICT r7 #3):
    # spin_sec_* is a constant single-core Python loop, scan_sec a
    # constant cached-parquet count() — neither depends on repo code,
    # so a cross-round bench ratio can be divided by the calibration
    # ratio to separate machine drift from plan drift.
    file_doc = dict(line_doc)
    file_doc["host"] = host
    file_doc["shared_fit"] = {
        "kmeans_fit_sec": round(kmeans_fit_sec, 3),
        "consumers": [
            "kmeans_centroids",
            "ann_ivf_kmeans",
            "ann_ivf_kmeans_indexed",
            "semantic_dedup",
            "embedding_outliers",
        ],
        "bpe_fit_sec": round(bpe_fit_sec, 3),
        "bpe_consumers": [
            "bpe_token_counts",
            "bpe_fertility",
        ],
        "note": "consumers share one cached Lloyd fit / "
        "one cached BPE merge list; their per-query times "
        "exclude training (train-once-serve-many); fit "
        "costs are these fields.  bpe_merges and "
        "bpe_production_merges pay full training in their "
        "own numbers — they ARE the training benchmark",
    }
    payload = json.dumps(file_doc, separators=(",", ":"))
    print(json.dumps(line_doc, separators=(",", ":")), flush=True)
    # The driver captures only the tail of stdout (VERDICT r6 #3
    # found BENCH_r06.json truncated at 2000 chars) — also persist the
    # full JSON to a file so cross-round comparison never depends on
    # the capture window.  Overridable for per-round snapshots
    # (BENCH_LOCAL_r<N>.json is a committed copy of this file).
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL_latest.json"),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(payload + "\n")
    except OSError as exc:  # never fail the bench over the side file
        print(f"# could not write {out_path}: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
