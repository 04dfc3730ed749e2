#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall times.

Each query is executed to completion (count() forces the full plan; the
driver-facing result sets are small aggregates, so count ≈ full execution
cost without collect-to-driver noise).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "a1_windowed_analytics",
    "a2_daily_analytics",
    "a4_vehicle_analytics",
    "a5_quality_histogram",
    "a9_vehicle_topk",
    "o1_filtered_scan_paginated",
    "m15_alerts",
    "j1_pricing_summary",
    "j3_shipping_priority",
    "j6_forecast_revenue",
    "j10_order_rollup",
    "j13_events_enriched",
    "j18_large_orders",
    "w1_top_orders_per_customer",
    "t5_top_terms",
    "d2_exact_dedup_keep_first",
    "d3_jaccard_pairs",
    "d4_minhash_lsh_dedup",
    "s1_knn_bruteforce",
    "s2_knn_ivf",
    "t1_token_stats",
    "t2_doc_quality",
    "t4_fingerprints",
    "adv1_sessionize",
    "adv2_asof_join",
    "adv6_percentiles",
    "mm2_media_type_stats",
    # round 2 additions: deepest star fan-in, profit rollup, left-join
    # histogram, dedup clustering, tf-idf, one-pass profile
    "j8_market_share",
    "j9_profit_by_nation",
    "j13b_order_count_distribution",
    "d7_dedup_clusters",
    "t6_tfidf_top_terms",
    "t7_documents_profile",
    # round 3 additions: bucketed range join, payload dedup, prefix-filter
    # exact-Jaccard join, grouping sets
    "adv11_range_join",
    "mm5_payload_dedup",
    # d8_jaccard_join_prefix was registry-retired r16 (redundant twin);
    # d8b below carries the identical plan shape in the pinned record
    "g3_groupingsets_order_stats",
    "j11b_supplier_value_share",
    "j12b_priority_by_returnflag",
    "dp1_corpus_clean",
    "s4_label_centroids",
    "mm6_shard_plan",
    # round 4 additions: full-corpus dedup clustering, LSH ANN + SimHash
    # certificates, BPE token stats, decile windows
    "d7_dedup_clusters_full",
    "s3_knn_lsh",
    "d5_simhash_neardup",
    "t8_bpe_token_stats",
    "w4_value_deciles",
    "d8b_jaccard_join_df_prefix",
    "dp2_corpus_clean_neardup",
    "w5_trailing_hour_aggs",
    "t9_pii_scan",
    "mm7_stratified_sample",
    "t10_repetition_profile",
    "dc1_benchmark_contamination",
    "t11_inverted_index",
    "dp3_training_mix",
    "dp4_cleaning_audit",
    "m16_burn_rate",
    # mergeable-state rollups, skew audit, SemDeDup cell routing
    "a17_incremental_rollup",
    "a18_sketch_cube",
    "dq1_key_skew_audit",
    "dq2_join_size_preflight",
    "d9_semantic_dedup",
    "t12_rarity_score",
    "m17_alert_incidents",
    "dp5_sequence_packing",
    "s5_scalar_quantization",
    "a19_resample_ffill",
    "u4_snapshot_diff",
    "dq3_referential_audit",
    "a20_seasonality_profile",
    "s6_knn_ivf_sq8",
    "adv12_robust_outliers",
    "t13_vocab_growth",
    # round 5 additions: multi-period backfill through the state table,
    # histogram-quantile merge, incremental delta dedup, semi-join
    # pre-filter
    "a17b_rollup_backfill",
    "a21_histogram_quantile_rollup",
    "d10_dedup_delta",
    "dq4_semijoin_prefilter",
    "dp8_document_chunking",
    # round 6 additions: state compaction proof, leakage-safe split
    "a17c_rollup_compaction",
    "dp9_leakage_safe_split",
    # round 7 additions: filtered ANN, incremental IVF delta-add,
    # staged event funnel
    "s7_knn_filtered",
    "s8_knn_ivf_delta_add",
    "w7_event_funnel",
    "adv13_salted_join",
    # round 8 additions: cross-document boilerplate removal, Zipf
    # profile, count-min heavy hitters, product-quantization ANN
    "dp10_boilerplate_removal",
    "t14_zipf_profile",
    "a22_cms_heavy_hitters",
    "s10_knn_pq",
    "mm8_phash_neardup",
    "dp11_split_decontamination",
    "dp12_quality_weighted_sample",
    "dq5_table_profile",
    "adv14_scd2_snapshot_merge",
    "dp13_reproducible_shuffle",
    "dp14_temperature_mix",
    "a23_incremental_join_view",
    "d11_neardup_keep_best",
    "t15_vocab_coverage",
    # round 9 additions: bigram-LM quality screen, script-mix profile,
    # cross-snapshot drift audit, exact MIPS baseline
    "dp15_bigram_lm_screen",
    "t16_script_mix",
    "dq6_snapshot_drift",
    "s12_mips_topk",
    # round 9, second batch: PMI collocations, BM25 retrieval, frequent
    # pairs, Markov transitions, dataset card, DSIR importance weights,
    # duplicated-span audit, fixed-point PageRank
    "t17_collocations_pmi",
    "t18_bm25_topk",
    "j23_frequent_pairs",
    "w8_markov_transitions",
    "dp16_dataset_card",
    "dp17_dsir_importance",
    "d12_duplicate_span_ratio",
    "adv15_pagerank",
    "dq7_expectation_audit",
    # round 10 additions: the log-space scoring twins (overflow-free
    # production forms of t17/j23) and the range-search serving primitive
    "t17b_collocations_pmi_log",
    "j23b_frequent_pairs_log",
    "s13_range_search",
    # round 10, post-pin batch (registered after the idle r10 pin was
    # written; they enter the pinned record with r11's pin — VERDICT r10
    # Next #6): the embedding-column audit and the Prometheus-surface
    # metrics export
    "dq8_embedding_audit",
    "m18_metrics_export",
    # round 11 additions: the production-scale PageRank twin and the
    # IVF cell-pruned range search (exact bound, s13's serving path)
    "adv15b_pagerank_scale9",
    "s13b_range_search_ivf",
    # round 12 addition: hybrid BM25+cosine RRF fusion (st15, the other
    # r12 registration, is excluded with the rest of the st* flows —
    # its wall is micro-batch commit latency, not plan cost)
    "s14_hybrid_rrf",
    # round 13 additions: the exact-bound IVF twin of s14 and the MMR
    # diversified rerank over the bounded candidate list
    "s16_hybrid_rrf_ivf",
    "s15_mmr_rerank",
    # round 14 addition: one distributed BPE merge step (vocab-scale
    # pair aggregation)
    "t19_bpe_merge_step",
    # round 16 additions: the retirement-freed-seat registrations — the
    # map-only PII rewrite and the cross-source duplicate matrix
    "dp18_pii_redaction",
    "u5_source_overlap_matrix",
    # round 17 additions: the retirement-freed-seat registrations — the
    # per-type PSI drift audit and the A-ES weighted reservoir sample
    "dq9_psi_drift",
    "dp19_weighted_reservoir",
    # s9 (index persist/reload) is registered + oracled but, like the
    # st* flows, excluded here: its wall is filesystem-commit latency
    # (partitioned index write + reload), not plan cost. s11 (tombstone
    # deletes) is excluded for the same reason: its wall is the physical
    # compaction (localCheckpoint materialization) plus two whole-index
    # content fingerprints — certificate cost, flat across 100× of
    # corpus (SCALE.md sweep), not plan cost
]


def _steal_canary() -> float:
    """Fixed-work CPU timer (3× 2000² float64 matmul, deterministic
    input): wall seconds for identical work, so co-tenant CPU steal —
    INVISIBLE in loadavg, which only counts this host's runnable
    threads — shows up as proportional inflation against the quiet
    reference. r11's pin adjudication needed exactly this: three runs
    in 'idle' (loadavg < 0.3) windows measured matched-query totals
    18-33% apart, and only solo re-measurement distinguished steal
    from regression. Recorded at start AND end of every bench run so
    the pinned record carries machine-state evidence on both edges."""
    import numpy as np

    a = np.full((2000, 2000), 0.5)
    a @ a  # untimed BLAS/thread-pool warmup, so the process's FIRST
    # canary draw is comparable to the end-of-run draw
    t0 = time.perf_counter()
    for _ in range(3):
        a @ a
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from iot_big_data_engineering_spark.registry import queries
    from iot_big_data_engineering_spark.session import get_spark

    try:
        load_at_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_at_start = None
    canary_at_start = _steal_canary()
    spark = get_spark(app_name="bench")
    qs = queries()

    # warm the JVM + parquet footers with one cheap action, and the Arrow
    # Python-worker pool with one trivial kernel (workers are reused across
    # jobs, so this moves one-time process spin-up out of the first
    # kernel-based query's measurement — same reason the JVM gets a warmup)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # best-of-N per query: single-shot numbers on a shared box carry
    # multi-second scheduler/GC/CPU-steal noise (observed 34 s vs 49 s
    # totals, and 2-4x per-query swings between back-to-back runs, for
    # identical code); the min over runs measures the plan, not the
    # noise. Two runs always; if they disagree by >1.5x AND the spread is
    # over 0.3 s (absolute floor: sub-second queries jitter harmlessly),
    # take a third — bounded extra wall time spent only where the first
    # two samples were contaminated. clearCache() before every timed run
    # so a query's persist() from run 1 cannot serve run 2 — each run
    # re-executes the full pipeline; only JVM/codegen warmth carries over.
    times: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = qs[name]
        samples: list[float] = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        # third sample when the first two disagree (>1.5x AND >0.3 s
        # spread) OR when the best sample is already mid-range heavy
        # (>3 s): r6 caught a contaminated d8 window where BOTH samples
        # were inflated (4.41 s vs 1.45 s solo) yet agreed closely
        # enough to skip the retry — a best-of-3 floor for heavy-looking
        # queries bounds that failure mode at a few seconds of extra
        # bench wall
        if (
            max(samples) > 1.5 * min(samples)
            and max(samples) - min(samples) > 0.3
        ) or min(samples) > 3.0:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        # a best sample still above 4.5 s is either a genuinely heavy
        # query (nothing here measures above ~3 s quiet) or a sustained
        # steal episode — spend up to two more samples before recording a
        # number that would read as an envelope breach (observed: d4
        # recorded 23.5 s across three contaminated samples, measures
        # ~3 s quiet)
        retries = 0
        while min(samples) > 4.5 and retries < 2:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            retries += 1
        times[name] = round(min(samples), 3)
        all_samples[name] = [round(s, 3) for s in samples]

    total = round(sum(times.values()), 3)
    # stdout carries ONLY the contract fields plus the 10 slowest queries,
    # compact-separated: the driver keeps a ~2 KB tail of stdout and parses
    # the JSON line from it — the full 74-query map (~2.8 KB) overflowed
    # that capture in r3 AND r4 and both BENCH files landed with
    # parsed:null. The complete per-query map goes to BENCH_DETAIL.json
    # next to this script instead.
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(times),
        "sf": sf,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    detail = dict(out)
    detail["queries"] = times  # full map — detail file only
    # EVERY timed sample per query, not just the min: a contaminated pin
    # (r6's dp2 at 2.90 s when three idle runs measured 1.65-1.97 s) is
    # self-evident machine-readably when the full spread is recorded
    # (VERDICT r6 demand #4)
    detail["samples"] = all_samples
    # machine context: sustained background load inflates wall times ~1.5x
    # (observed 45 s vs 67 s totals for identical code) — record it so
    # cross-round deltas are interpretable. The START sample is the
    # meaningful one (by the end, the 1-min average mostly measures the
    # bench's own 32 threads).
    if load_at_start is not None:
        detail["loadavg_at_start"] = load_at_start
    try:
        detail["loadavg_at_end"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    detail["canary_s_at_start"] = canary_at_start
    detail["canary_s_at_end"] = _steal_canary()
    this_round = _current_round()
    detail["round"] = this_round
    prev_round, prev = _latest_prev_bench(this_round)
    if prev is not None and prev.get("sf") == sf:
        pq = prev.get("queries", {})
        detail["prev_round"] = prev_round
        detail["delta_vs_prev"] = {
            n: round(t - pq[n], 3) for n, t in times.items() if n in pq
        }
        if isinstance(prev.get("value"), (int, float)):
            detail["delta_total_vs_prev"] = round(total - prev["value"], 3)
    here = os.path.dirname(os.path.abspath(__file__))
    # BENCH_DETAIL.json is a SCRATCH pointer (latest run, any load);
    # BENCH_DETAIL_r{N}.json is the immutable per-round record — written
    # once per round (first run wins: the builder commits an idle run, and
    # a later loaded driver rerun must not clobber it — VERDICT r5 #1).
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    # pin only runs at the contract SF (default sf0.1) — a local sf0.001
    # iteration loop must not claim the round's immutable slot
    if this_round is not None and sf_dir == "/root/testdata/sf0.1":
        _maybe_pin(here, this_round, detail)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


def _maybe_pin(here: str, this_round: int, detail: dict) -> None:
    """Write the round's immutable BENCH_DETAIL_r{N}.json, guarding two
    failure modes the mutable scratch file doesn't have:

    - Premature pin (ADVICE r6): the driver writes BENCH_r{N}.json
      mid-round, BEFORE the round's correctness/verdict land, so a bench
      rerun in that window infers round N+1 and would claim N+1's slot
      with a run from the wrong (often judge-loaded) machine state.
      Unless $SPARK_GRAFT_ROUND pins the round explicitly, refuse when
      round N (the inference base) isn't fully closed — its
      CORRECTNESS_r{N}.json not yet on disk.
    - Contaminated pin (VERDICT r6 demand #4): first-run-wins once froze
      a noisy sample (r6 dp2 at 2.90 s vs 1.54-1.97 s everywhere else).
      Allow exactly ONE re-pin per round, only when the new run
      contradicts the committed record by >1.5x AND >0.5 s on some query
      — i.e. when the pin is machine-readably implausible, not merely
      jittery. The replaced record's samples are preserved under
      "repinned_over" so the history stays auditable.
    """
    if not os.environ.get("SPARK_GRAFT_ROUND", "").isdigit() and this_round > 1:
        # "closed" means git-TRACKED, not merely on disk: the driver
        # drops CORRECTNESS_r{N}.json untracked at judge time — exactly
        # the judge-loaded window this guard exists to refuse — and it
        # only becomes tracked at the round-boundary commit (the same
        # rule correctness_diff.load_rounds applies, reused here)
        import correctness_diff as cd

        tracked = cd._tracked_correctness_files(here)
        base = f"CORRECTNESS_r{this_round - 1:02d}.json"
        closed = (
            base in tracked
            if tracked is not None
            else os.path.exists(os.path.join(here, base))
        )
        if not closed:
            return
    pinned_path = os.path.join(here, f"BENCH_DETAIL_r{this_round:02d}.json")
    if not os.path.exists(pinned_path):
        with open(pinned_path, "w") as f:
            json.dump(detail, f, indent=1)
        return
    try:
        with open(pinned_path) as f:
            pinned = json.load(f)
    except (OSError, ValueError):
        return
    if pinned.get("repinned"):  # one re-pin per round, ever
        return
    old_q = pinned.get("queries", {})
    new_q = detail.get("queries", {})
    contradicted = [
        n
        for n, t_old in old_q.items()
        if n in new_q and t_old > 1.5 * new_q[n] and t_old - new_q[n] > 0.5
    ]
    if not contradicted:
        return
    repin = dict(detail)
    repin["repinned"] = True
    repin["repin_contradicted"] = sorted(contradicted)
    # per-query MINIMA across old and new records (ADVICE r7): a
    # wholesale swap would silently freeze WORSE times for every query
    # the (possibly load-contaminated) new run happened to measure
    # slower, with repinned=True then blocking any correction. The min
    # is the right merge for a lower-bound-seeking wall-time record;
    # both raw runs stay auditable (samples + repinned_over).
    repin["queries"] = {
        n: min(t for t in (old_q.get(n), new_q.get(n)) if t is not None)
        for n in set(old_q) | set(new_q)
    }
    repin["value"] = round(sum(repin["queries"].values()), 3)
    # the min-merge composes per-query minima from TWO different runs, so
    # the headline total was never measured in any single run — mark it
    # and keep both raw totals so the record stays auditable (ADVICE r8:
    # "value" and "samples" must not silently describe different
    # measurements)
    repin["value_synthetic"] = True
    repin["run_totals"] = {
        "pinned": pinned.get("value"),
        "rerun": detail.get("value"),
    }
    repin["repinned_over"] = {
        "queries": old_q,
        "samples": pinned.get("samples"),
        "loadavg_at_start": pinned.get("loadavg_at_start"),
    }
    with open(pinned_path, "w") as f:
        json.dump(repin, f, indent=1)


def _current_round() -> int | None:
    """This bench run's round number: newest committed BENCH_r*.json + 1
    (the driver writes BENCH_r{N}.json only AFTER the round's bench runs),
    overridable via $SPARK_GRAFT_ROUND. None if neither source exists."""
    import glob
    import re

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env and env.isdigit():
        return int(env)
    here = os.path.dirname(os.path.abspath(__file__))
    best_n = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m and (best_n is None or int(m.group(1)) > best_n):
            best_n = int(m.group(1))
    return None if best_n is None else best_n + 1


def _latest_prev_bench(this_round: int | None):
    """Previous round's full per-query map → (round_n, data) or (None,
    None). The immutable BENCH_DETAIL_r{N-1}.json is the primary source,
    and the round label comes from the file's own "round" field (ADVICE
    r5: labeling from BENCH_r file names while sourcing the map from the
    mutable BENCH_DETAIL.json could attribute a delta to the wrong run).
    Falls back to the newest parseable BENCH_r*.json."""
    here = os.path.dirname(os.path.abspath(__file__))
    if this_round is not None and this_round >= 2:
        try:
            path = os.path.join(
                here, f"BENCH_DETAIL_r{this_round - 1:02d}.json"
            )
            with open(path) as f:
                detail = json.load(f)
            if isinstance(detail.get("queries"), dict) and detail["queries"]:
                return detail.get("round", this_round - 1), detail
        except (OSError, ValueError):
            pass
    if this_round is None or this_round < 2:
        return None, None
    best_n = this_round - 1
    try:
        with open(os.path.join(here, f"BENCH_r{best_n:02d}.json")) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return best_n, None
    # the driver wraps our JSON line under "parsed"
    if "queries" not in data and isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    if not isinstance(data.get("queries"), dict):
        return best_n, None
    return best_n, data


if __name__ == "__main__":
    main()
