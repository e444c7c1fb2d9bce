"""Benchmark suite (BASELINE.md §'Our bench suite').

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": "total_wall_sec", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time is the median of 3 runs after a warmup pass (JVM/codegen and
file-index warm, like a long-lived cluster session).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import __spark_entry__ as entry
from bullet_spark_spark import get_spark
from bullet_spark_spark.plans import Query, TopKAgg, compile_query

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH = [
    "bullet_group_agg",       # filtered group-agg on events
    "bullet_count_distinct",  # count-distinct user_id
    "bullet_quantile",        # quantiles of l_extendedprice (histogram targeted-rank)
    "bullet_topk_freq",       # top-k frequency
    "window_tumbling_10m",    # tumbling-window count on events
    "join_fact_fact",         # equi-join lineitem x orders
    "dedup_exact",            # exact dedup on documents + events
    "sim_cosine_topk",        # cosine top-k on embeddings
    "tpch_q1_pricing",        # flagship wide aggregation
    "dedup_minhash_lsh",      # minhash+LSH near-dup (scale path)
    # round-2 additions (keep the 10 above stable for cross-round compare)
    "join_asof",              # as-of join purchases x clicks per user
    "time_bucket_rollup",     # day->month->year rollup, partial reuse
    "text_repetition",        # Gopher repetition metrics per doc
    "decontam_ngram",         # eval-set n-gram contamination
    # round-3 additions
    "tpch_q6_forecast",       # full-pushdown filter scan + single-row agg
    "sketch_quantile_merge",  # mergeable quantile sketch build + slice re-merge
    # round-4 additions
    "tpch_q21_waiting_supp",  # EXISTS/NOT-EXISTS via single-scan per-(order,supp) agg
    "text_unigram_logprob",   # corpus-trained unigram LM scoring (2-pass tokenize)
    "text_scrub_spans",       # exact-substring span scrub + text rebuild
    "dedup_segments",         # cross-doc segment dedup (freq shuffle + broadcast rebuild)
    "text_bigram_logprob",    # interpolated bigram LM (persisted pairs, 1 shuffle join)
    # round-4 final additions
    "graph_pagerank_trade",   # 5-iteration checkpointed PageRank (iterative workload)
    "text_tfidf_keywords",    # (doc,term) agg + 2 stat windows + per-doc top-k
    "quality_snapshot_diff",  # full-outer CDC diff w/ inline fingerprints
    # round-5 additions
    "dedup_lexical_cosine",   # inverted-index tf-idf cosine pairs (stop-term-pruned)
    "dedup_containment_pairs", # Broder containment via posting self-join
    "distribution_ks_test",   # exact two-sample KS (two-level cumsum CDFs)
    "multimodal_warc_roundtrip",  # WARC compose (codegen) + parse (mapInPandas)
    "text_flesch",            # readability scoring, single codegen pass
    # round-6 additions (VERDICT r5 task 6): the heaviest oracle-sweep
    # queries tracked round-over-round so the expensive paths can't
    # regress silently
    "dedup_ensemble_survivors",  # minhash-LSH ∪ blocked-GEMM cosine + closure
    "pipeline_release_v2",    # full curation capstone composition
    "pipeline_ingest_warc",   # WARC parse → extract → quality-gate capstone
    # round-6 late additions
    "sketch_bloom_prune",     # bloom build + shuffle-free probe + exact verify
    "sketch_cms_freq_est",    # count-min build + broadcast-join lookups
    # round-6 final additions: span-level dedup family + ML quality path
    "dedup_span_scrub",       # overlapping-gram span scrub + corpus rebuild
    "dedup_winnow_pairs",     # MOSS winnowing fingerprints + posting pair join
    "pipeline_quality_release",  # seed-train MLlib classifier + broadcast-model corpus filter
    # round-7 additions: the new certified families
    "quality_filter_frozen",  # frozen-coefficient release gate (pure codegen map)
    "sim_pq_ann",             # PQ codebook train + encode + ADC top-k
    "sketch_cms_error_md5",   # md5-portable count-min build + full-keyset lookup
    # round-7 late additions: data-layout + iterative-ML families
    "scale_zorder_pruning",   # Morton zone maps, both layouts + read-amp report
    "sim_kmeans_lloyd",       # 3-iteration distributed Lloyd (broadcast centroids)
    "sim_hybrid_rrf",         # BM25 + dense cosine fused by decimal-exact RRF
    # round-8 additions: the new certified families
    "dedup_fuzzy_pairs",      # PassJoin pigeonhole blocking + levenshtein verify
    "quality_gopher_rules",   # Gopher rule-set funnel (single codegen pass)
    "text_vocab_coverage",    # top-N vocab build + per-source OOV audit
    "temporal_seasonal_decompose",  # 2xMA trend + quantized seasonal means
    "sampling_token_budget",  # token-budget mixture plan (1 exact agg)
    "dedup_weighted_jaccard", # tf-weighted Jaccard posting self-join
    "dedup_eval_fuzzy",       # dedup eval harness (full-outer pair join)
    "pipeline_ccnet_buckets", # chunk -> LM-score -> perplexity terciles
    "scale_column_stats",     # exact NDV + quartiles (range-partitioned rank)
    "distribution_chi2_gof",  # chi-square GOF (one combinable count agg)
    "temporal_holt_forecast", # Holt fold over per-key ordered series
    # round-9 additions
    "text_zipf_fit",          # top-n vocab + 500-row OLS (decimal sums)
    "text_unigram_kl",        # two token aggs + full-outer term join
    "scale_shard_manifest",   # md5-hash + bit_xor shard aggregate
    "sampling_bootstrap_ci",  # 64x Poisson-replicate explode + 2 aggs
    # round-9 late additions
    "window_hopping_10m_5m",  # sliding windows (2x in-aggregate Expand)
    "text_unigram_js",        # symmetric JS over the persisted term frame
    "sampling_bootstrap_by_lang",  # per-group replicate agg + CI window
    "dedup_weighted_minhash_cws",  # row-wise CWS + exact-differential join
    "temporal_cusum_volume",  # CUSUM reflection form (2 window passes)
    "temporal_trend_robust",  # Theil-Sen/Mann-Kendall pair self-join
    # round-9 final additions (r10 oracle queue)
    "graph_triangles_supplier",  # degree-oriented wedge join + closure semi-join
    "distribution_mannwhitney",  # tie-corrected rank-sum (two-level cumsum)
    "distribution_welch_ttest",  # one combinable 6-number aggregate
    "distribution_spearman",  # doubled-avg-rank maps + one moment agg
    "temporal_acf",           # lag-exploded deviation self-join (lags 1..7)
    "temporal_ccf",           # same shape, lags -7..7 over the (x,y) pivot
    "scale_compaction_plan",  # FFD striping over the file inventory
    "relational_frequent_pairs",  # basket self-join + lift panel
    "graph_adamic_adar",      # hub-capped wedge expansion + decimal term sums
    "sampling_neyman_alloc",  # one moment agg + broadcast total
    # round-10 additions (r11 oracle queue)
    "dedup_bbit_minhash",     # 32x-compressed b-bit verify after full-sig banding
    "distribution_ab_power",  # MDE/power panel (one 6-number aggregate)
    "temporal_interval_overlap",  # interval x interval bucket-exploded join
    "graph_kcore_trade",      # iterative peeling to the 3-core fixpoint
    "distribution_kruskal",   # k-sample rank panel (two-level cumsum ranks)
    # round-11 late additions (r12 oracle queue)
    "graph_bfs_khop",         # level-synchronous frontier BFS, 3 hops
    "relational_record_linkage",  # 2-pass blocked levenshtein linkage
    "streaming_session_drain",  # session windows drained through append mode
    "dedup_cdc_chunks",       # gear-hash CDC chunking panel (map-only)
    "scale_bucketed_join",    # write-time bucketing, zero-Exchange SMJ
    "dedup_rate_estimate",    # content-key cluster-sampled dup rate
    "behavior_attribution",   # first/last/linear multi-touch credit
    "relational_merge_upsert",  # MERGE INTO as one full-outer join
    "graph_cheapest_path",    # delta-frontier Bellman-Ford, 3 hops
    "scale_bucketed_agg",     # exchange-free agg on the bucket key
    "streaming_quantile_drain",  # bounded-state streaming quantiles (payload sample)
    "graph_communities_lpa",  # 3-round deterministic label propagation
    "multimodal_wds_roundtrip",  # ustar shard compose + checksum-verify parse
    "streaming_drift_psi_drain",  # PSI drift panel through a complete-mode drain
    "pipeline_wds_release",   # gate -> dedup -> shard -> tar export -> manifest
    "scale_join_size_estimate",  # bucketed-histogram join cardinality panel
]

REPEATS = 3

# Control-plane cycles get 5 samples (vs 3 for queries): the @32 figure is
# floor-dominated (~1.7 s of micro-batch machinery per cycle) so a single
# contended cycle moves the median of 3 by ~15% — exactly the r8→r9 driver
# artifact swing (21.12→17.98 q/s) that local isolated runs on the SAME two
# code revisions measured as 19.21 vs 19.16 q/s (BENCH_LOCAL_r08/r09). The
# full artifact records every sample plus the floor comparison so a swing
# outside the documented band is visible as data, not narrative.
CONTROL_REPEATS = 5
# Floor = worst isolated local median observed across r8/r9 code (19.16 @32,
# 38.8 @128) minus the ~5% sampling band. A median below this on an
# isolated=true run means a REAL regression, not contention.
CONTROL_FLOOR_32 = 18.0
CONTROL_FLOOR_128 = 36.0

# Measurement order: iterative/cache-heavy queries FIRST (right after
# warmup, coldest heap) — three rounds of bench artifacts showed pagerank
# at 6.3-9.0 s when measured late in the suite vs 4.8-5.4 s standalone on
# an idle host, i.e. the in-suite number was measuring predecessor GC/heap
# pressure, not the query (clearCache+gc before each query reclaims blocks
# but not JVM heap fragmentation). Membership and reported keys are
# unchanged; only the wall-clock ordering moves.
MEASURE_FIRST = [
    "graph_pagerank_trade",
    "graph_adamic_adar",
    "dedup_ensemble_survivors",
    "sim_kmeans_lloyd",
    "dedup_weighted_minhash_cws",
]


# Bounded: the 1-min loadavg decays with a ~60 s time constant, so the
# residual of a just-finished sweep (observed ~7.5 on 32 cpus) crosses the
# isolation threshold (4) in ~40 s; 150 s covers 3× that while keeping the
# bench's total wall safely inside any harness timeout.
#
# Run-to-run variance caveat (r7, three consecutive runs ALL isolated=true
# by the start-load test): shared-subset geomean spanned 0.95–1.09× and
# individual queries up to 4× (q21 0.9→4.0 s) with no code change — the
# host has contention phases the START loadavg cannot see. Adjudicate
# rounds on the shared-subset GEOMEAN plus the streaming_rows_per_sec
# sanity figure (it collapses ~40% in contended runs), never a single
# query's delta; prefer the run with the higher streaming rate when two
# artifacts disagree.
QUIET_MAX_WAIT_S = 150


def _wait_for_quiet(cpus: int) -> tuple[list[float], float]:
    """Block (bounded) until the 1-min loadavg drops under the isolation
    threshold — the r5/r6 bench artifacts were repeatedly non-isolated
    because the harness runs the bench right after a full oracle sweep,
    whose RESIDUAL loadavg (the JVMs are already gone) poisons the
    before-reading for a few minutes. Waiting out the decay is free and
    makes round-over-round numbers comparable; a host that is ACTUALLY
    busy keeps the load up and the wait times out, correctly reporting
    isolated=false. Returns (loadavg at first check, seconds waited)."""
    first = os.getloadavg()
    threshold = cpus / 8
    waited = 0.0
    while os.getloadavg()[0] >= threshold and waited < QUIET_MAX_WAIT_S:
        time.sleep(5)
        waited += 5
    return [round(x, 2) for x in first], waited


def main() -> None:
    # host-load context: cross-round comparisons are only meaningful when
    # both runs were isolated — documented 2-4x swings under load
    cpus_ = os.cpu_count() or 1
    load_initial, quiet_wait_s = _wait_for_quiet(cpus_)
    load_before = os.getloadavg()
    spark = get_spark(app_name="bullet-spark-spark-bench")
    qs = entry.queries()

    # warmup: file index + codegen + broadcast machinery
    for name in BENCH:
        qs[name](spark, SF_DIR).limit(1).collect()

    # Host-health probe (VERDICT r11 task 2): median wall of a warm
    # 1-task job. Healthy band: TENS of ms. 200-700 ms reproduces only on
    # a contended/degraded host (measured in r11 on a vanilla SparkSession
    # with zero repo code) and inflates overhead-bound queries uniformly —
    # a consumer comparing rounds should trust per-query deltas only when
    # both runs' probes are in the healthy band. Measured twice (post-
    # warmup and end-of-run); the compact line carries the first.
    probe_start_ms = _probe_1task_ms(spark)

    times: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    import gc as _gc

    measure_order = MEASURE_FIRST + [n for n in BENCH if n not in MEASURE_FIRST]
    for name in measure_order:
        # independent measurements: without this, ~24 queries' persisted
        # frames accumulate in the executor heap and the later (iterative,
        # cache-heavy) queries measure GC pressure from their predecessors
        # (pagerank: 9.0 s in-suite vs 6.3 s standalone on an idle host).
        # The driver gc additionally releases py4j refs to eagerly
        # localCheckpoint'ed RDDs (layout/kmeans families) so
        # ContextCleaner can drop their blocks — without it the r7 suite
        # showed 2-4x inflation on late queries (span_exact 11 s in-sweep
        # vs 1 s standalone).
        spark.catalog.clearCache()
        _gc.collect()
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            n = qs[name](spark, SF_DIR).count()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 4)
        all_samples[name] = [round(s, 4) for s in samples]

    times = {n: times[n] for n in BENCH}  # stable artifact order
    # r11 (VERDICT r10 task 9): the committed artifact carries every
    # sample for the TOP-10 most expensive queries, so round-over-round
    # comparisons of the heavy family stop adjudicating single-sample
    # noise (the control-plane floor got this in r10; this is the query
    # side of the same discipline)
    top10 = sorted(times, key=times.get, reverse=True)[:10]
    queries_samples = {n: all_samples[n] for n in top10}

    streaming_rps = _streaming_ingest_rate(spark)
    control_qps, control_register_qps, control_samples = _control_plane_rate(spark)
    control_qps_128, _, control_samples_128 = _control_plane_rate(
        spark, n_queries=128
    )

    probe_end_ms = _probe_1task_ms(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    load_after = os.getloadavg()
    cpus = os.cpu_count() or 1
    isolated = load_before[0] < cpus / 8
    out = {
        "metric": "total_wall_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        # median-of-REPEATS is what `queries` carries; the raw samples for
        # the 10 most expensive queries ride along (VERDICT r10 task 9)
        "queries_samples_top10": queries_samples,
        # warm 1-task-job medians in ms: healthy host = tens of ms;
        # 200-700 ms = degraded/contended window (see _probe_1task_ms)
        "probe_1task_ms": probe_start_ms,
        "probe_1task_ms_end": probe_end_ms,
        "streaming_rows_per_sec": streaming_rps,
        "control_plane_queries_per_sec": control_qps,
        "control_plane_queries_per_sec_128": control_qps_128,
        "control_plane_register_per_sec": control_register_qps,
        # every control-plane cycle sample (median above) + the regression
        # floor: on an isolated run a median below the floor is a REAL
        # regression; above it, deltas are the documented contention band
        # (VERDICT r9 task 2 — the r8→r9 21.12→17.98 swing measured 19.21
        # vs 19.16 locally on the same two code revisions).
        "control_plane_samples_32": control_samples,
        "control_plane_samples_128": control_samples_128,
        "control_plane_floor_32": CONTROL_FLOOR_32,
        "control_plane_floor_128": CONTROL_FLOOR_128,
        "control_plane_floor_ok": bool(
            control_qps >= CONTROL_FLOOR_32
            and control_qps_128 >= CONTROL_FLOOR_128
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # run context for cross-round adjudication (judge/VERDICT r03 ask):
        # loadavg at start/end; isolated = the host was not otherwise busy
        # when the run STARTED (the bench's own 32 worker threads dominate
        # loadavg_after, so only the before-value indicates contention).
        # Threshold cpus/8: a residual loadavg of ~4 on 32 cpus — e.g. a
        # test suite that JUST finished — measurably skews the iterative
        # queries (pagerank +40% observed) and must not read as isolated.
        "loadavg_initial": load_initial,       # at process start, pre-wait
        "quiet_wait_sec": quiet_wait_s,        # residual-load decay waited out
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
        "isolated": isolated,
    }
    # Full artifact to a known repo path (VERDICT r9 task 7): the driver
    # captures only the last 2000 chars of stdout, and the full 74-query
    # map alone serializes to ~1970 chars — it cannot fit a parseable
    # stdout line. BENCH_FULL.json carries the complete artifact (the
    # driver's end-of-round commit picks it up); stdout gets the full line
    # for humans plus a FINAL compact line sized to the driver's tail.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    print(_compact_line(out))


# Compact-line budget policy for the raw-sample block. The r11 driver's
# PERF comparator treats any non-numeric value in `queries` as a missing
# query, so samples must NEVER ride inside `queries` (that format made the
# 7 heaviest-and-most-optimized queries read as "dropped" in PERF_r11) —
# they get their own `queries_samples_top10` key, truncated to the top
# SAMPLES_IN_COMPACT entries / SAMPLES_RESERVE chars so the medians map
# keeps its tail coverage (each sample entry costs ~1.7 median entries;
# the full top-10 block lives in BENCH_FULL.json either way).
SAMPLES_RESERVE = 240
SAMPLES_IN_COMPACT = 5


def _compact_line(out: dict, budget: int = 1900) -> str:
    """One JSON line <= ``budget`` chars for the driver's 2000-char stdout
    tail: headline + host-health metrics, as many per-query medians as fit
    (costliest first, 2 dp — the sub-0.1 s tail is measurement noise
    anyway; every value in `queries` is PLAIN NUMERIC so the driver's
    round-over-round comparator can parse it), raw samples for the heavy
    family in the separate `queries_samples_top10` key (truncated to fit),
    with the omission count and the full-artifact path stated in-band."""
    head = {
        "metric": out["metric"],
        "value": round(out["value"], 2),
        "unit": out["unit"],
        "sf": out["sf"],
        # host-health fields (VERDICT r11 task 2): probe_1task_ms is the
        # median wall of a warm 1-task job — tens of ms on a healthy host,
        # 200-700 ms in the degraded/contended windows that inflated the
        # r7/r11 driver artifacts. A consumer seeing a high probe (or a
        # streaming rate ~half the committed isolated figure) should read
        # uniform slowdowns as host contention, not plan regressions.
        "probe_1task_ms": out["probe_1task_ms"],
        "streaming_rows_per_sec": out["streaming_rows_per_sec"],
        "control_plane_queries_per_sec": out["control_plane_queries_per_sec"],
        "control_plane_queries_per_sec_128": out[
            "control_plane_queries_per_sec_128"
        ],
        "control_plane_floor_ok": out["control_plane_floor_ok"],
        "isolated": out["isolated"],
        "queries_total": len(out["queries"]),
        "queries_omitted": 0,
        "full": "BENCH_FULL.json",
        "queries": {},
        "queries_samples_top10": {},
    }
    ranked = sorted(out["queries"].items(), key=lambda kv: -kv[1])
    samples = out.get("queries_samples_top10", {})

    def fits(limit: int) -> bool:
        return len(json.dumps(head, separators=(",", ":"))) <= limit

    # Pass 1: plain numeric medians, costliest first, leaving headroom for
    # the samples block.
    for name, sec in ranked:
        head["queries"][name] = round(sec, 2)
        head["queries_omitted"] = len(ranked) - len(head["queries"])
        if not fits(budget - SAMPLES_RESERVE):
            del head["queries"][name]
            head["queries_omitted"] = len(ranked) - len(head["queries"])
            break
    # Pass 2: raw samples for the heaviest queries (VERDICT r10 task 9 —
    # round-over-round adjudication of the heavy family needs the sample
    # band, not a single median), truncated to the compact-line cap.
    for name, _ in ranked:
        if name not in samples:
            continue
        if len(head["queries_samples_top10"]) >= SAMPLES_IN_COMPACT:
            break
        head["queries_samples_top10"][name] = [
            round(s, 2) for s in samples[name]
        ]
        if not fits(budget):
            del head["queries_samples_top10"][name]
            break
    # Pass 3: if the samples block under-used its reserve, give the space
    # back to the medians tail.
    for name, sec in ranked:
        if name in head["queries"]:
            continue
        head["queries"][name] = round(sec, 2)
        head["queries_omitted"] = len(ranked) - len(head["queries"])
        if not fits(budget):
            del head["queries"][name]
            head["queries_omitted"] = len(ranked) - len(head["queries"])
            break
    return json.dumps(head, separators=(",", ":"))


def _probe_1task_ms(spark, n: int = 7) -> float:
    """Median wall-clock (ms) of a warm single-task job — the in-band host
    health probe (VERDICT r11 task 2). On a healthy host this is tens of
    ms (task scheduling + one empty task); on a contended/degraded host it
    was measured at 200-700 ms on a vanilla SparkSession with zero repo
    code, the same windows in which overhead-bound bench queries inflate
    uniformly 2-4x. It measures the scheduler/JVM floor, not any query."""
    sc = spark.sparkContext
    sc.parallelize([1], 1).count()  # warm the RDD path itself
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        sc.parallelize([1], 1).count()
        samples.append((time.perf_counter() - t0) * 1000)
    return round(statistics.median(samples), 1)


def _streaming_ingest_rate(spark) -> float:
    """Drain the events table through a real Structured Streaming grouped
    query (availableNow) and report rows/sec of ingest — the BASELINE.md
    streaming-suite metric. Warmup + median-of-REPEATS, like the query
    suite and the control-plane metric."""
    import statistics as _stats
    import tempfile

    from bullet_spark_spark.plans import AggOp, GroupAgg, Query
    from bullet_spark_spark.sources.batch import load_table
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming import EngineRuntime

    events = load_table(spark, "events", SF_DIR)
    n_rows = events.count()

    def cycle() -> float:
        # same isolation discipline as the query loop: the driver gc
        # releases py4j refs from prior cycles/queries so ContextCleaner
        # can reclaim their JVM-side objects — without it, consecutive
        # cycles in one process measure accumulated driver garbage, not
        # ingest capacity (r11 opt: repro showed monotone 19.0→14.5 q/s
        # decay no-gc vs stable 17–20 q/s with inter-cycle gc)
        import gc as _gc

        _gc.collect()
        rt = EngineRuntime(spark)
        with tempfile.TemporaryDirectory() as work:
            stream = file_drip(spark, events, work, chunks=8, max_files_per_trigger=4)
            spec = Query(
                source="events",
                aggregation=GroupAgg(
                    fields=["event_type"],
                    operations=[(AggOp.COUNT, None, "cnt"), (AggOp.SUM, "value", "sv")],
                ),
            )
            t0 = time.perf_counter()
            rt.run_available(spec, stream, checkpoint_dir=f"{work}/ck")
            wall = time.perf_counter() - t0
        rt.stop_all()  # deregisters the progress listener before teardown
        return n_rows / wall

    cycle()  # warmup
    return round(_stats.median(cycle() for _ in range(REPEATS)), 1)


def _control_plane_rate(
    spark, n_queries: int = 32
) -> tuple[float, float, list[float]]:
    """Queries/sec through the external control plane + dynamic
    multiplexer — the reference's raison-d'être metric (many concurrent
    queries sharing one stream, BASELINE.md posture table): ``n_queries``
    BQL queries submitted over the control transport, parsed, registered,
    evaluated over a full drain of the events stream, and completed;
    rate = queries fully served / wall. Same warmup+median methodology as
    the query suite (one warmup cycle for JVM/codegen/Arrow init — a
    long-lived cluster session — then the median of REPEATS timed cycles).

    The 32-query figure is floor-dominated, not capacity-dominated: a
    cycle's wall is ~0.65 s of micro-batch machinery (4 batches x offset/
    commit logs + batch planning) + ~0.2 s/batch of fresh-frame Catalyst
    analysis, while the MARGINAL cost per extra query is ~5-8 ms (shared
    scan, one routed aggregation regardless of N) — so the served rate
    SCALES with concurrency (~34 q/s at 64, ~51 q/s at 128, measured
    r5). The 128-query companion metric below reports the reference's
    actual posture (hundreds of live queries on one stream)."""
    import tempfile

    from bullet_spark_spark.sources.batch import load_table
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.control import ControlPlane, submit_query
    from bullet_spark_spark.streaming.dynamic import DynamicMultiplexer

    events = load_table(spark, "events", SF_DIR)

    def cycle() -> tuple[float, float]:
        # inter-cycle driver gc: identical rationale to the query loop's
        # clearCache+gc (bench isolation) — the control-plane baseline
        # artifact showed monotone in-process decay ([19.73 … 12.53] over
        # 5 cycles) that reproduces under heap pressure without gc and
        # disappears with it; the metric is control-plane capacity, not
        # predecessor garbage
        import gc as _gc

        _gc.collect()
        with tempfile.TemporaryDirectory() as work:
            mux = DynamicMultiplexer(spark)
            plane = ControlPlane(
                spark, mux, f"{work}/control", f"{work}/status.jsonl",
                poll_interval_s=0.05,
            )
            plane.start()
            # data prep OUTSIDE the timed serve cycle: writing the drip
            # parquet is the test harness materializing a stream that, in
            # production, already exists — the metric is submit → register
            # → evaluate → complete, not parquet write throughput
            stream = file_drip(spark, events, f"{work}/drip", chunks=4)
            t0 = time.perf_counter()
            for i in range(n_queries):
                submit_query(
                    f"{work}/control",
                    f"q{i}",
                    "SELECT user_id, COUNT(*) AS n, MIN(value) AS mn FROM STREAM() "
                    f"WHERE user_id % {n_queries} = {i} GROUP BY user_id",
                )
            deadline = time.time() + 60
            while len(mux.queries) < n_queries and time.time() < deadline:
                time.sleep(0.02)
            t_registered = time.perf_counter()
            mux.start(stream, checkpoint_dir=f"{work}/ck", available_now=True)
            wall = time.perf_counter() - t0
            plane.stop()
            # count only queries that actually completed a full serve cycle —
            # a registration stall must not inflate the reported rate
            served = sum(
                1 for h in mux.queries.values() if h.state.value == "COMPLETED"
            )
        # two rates: the full serve cycle (submit -> register -> drain the
        # whole stream -> complete; bounded by DATA throughput, not control
        # capacity) and the control plane alone (submit -> parse ->
        # registered — profiling shows 32 queries register in 20-40 ms, so
        # the plane itself sustains ~10^3 q/s; the reference's "hundreds of
        # queries re-broadcast per batch" posture is about this capacity)
        return served / wall, n_queries / max(t_registered - t0, 1e-9)

    cycle()  # warmup
    runs = [cycle() for _ in range(CONTROL_REPEATS)]
    serve = round(statistics.median(r[0] for r in runs), 2)
    register = round(statistics.median(r[1] for r in runs), 1)
    return serve, register, [round(r[0], 2) for r in runs]


if __name__ == "__main__":
    main()
