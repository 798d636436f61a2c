#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": <sf>}

Every query is forced end-to-end with the `noop` sink (full materialization,
no driver collect, no column-pruning shortcut a bare count() would allow).
The flagship restructure pipeline additionally runs as a real file write
(topic tree in, exact-named hourly CSVs out) since the file sink IS the
reference's workload.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402  (registers all queries)
from radar_output_restructure_spark import get_spark  # noqa: E402
from radar_output_restructure_spark.plans.restructure import (  # noqa: E402
    RestructureConfig,
    RestructurePlan,
)
from radar_output_restructure_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: reference-parity core + TPC-H-ish analytics + training-data ops.
BENCH_QUERIES = [
    "restructure_flagship",
    "event_time_cascade",
    "flatten_projection",
    "dedup_keep_last",
    "offset_antijoin",
    "extraction_check",
    "top_events_per_user",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast",
    "tpch_q18_large_orders",
    "doc_token_stats",
    "doc_quality",
    "doc_unigram_logprob",
    "dedup_exact_docs",
    "dedup_clusters_docs",
    "minhash_lsh_pairs_docs",
    "simhash_docs",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup_pairs",
    "session_windows_events",
    "hourly_event_counts",
    "multimodal_features",
    # round-2 additions
    "asof_last_purchase",
    "rolling_1h_user_stats",
    "doc_tfidf_top_terms",
    "char_ngram_jaccard_docs",
    "stratified_sample_docs",
    # round-3 additions
    "ann_ivf_trained_topk",
    "doc_contamination",
    "doc_repetition",
    "doc_sliding_chunks",
    "asof_next_purchase",
    "doc_bigram_logprob",
    "doc_redact_pii",
    # round-4 additions
    # (embedding_near_dup_pairs_auto was folded into the undecorated
    #  embedding_near_dup_pairs name by the r6-verdict demotion)
    "simhash_near_dup_docs",
    "doc_winnow_fingerprints",
    "doc_fingerprint_overlap",
    "temperature_mixture_docs",
    "knn_label_accuracy",
    "event_props_json",
    "ann_pq_topk",
    "tpch_q4_priority",
    "tpch_q16_supplier_variety",
    "tpch_q10_returned_items",
    "tpch_q13_custdist",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q22_idle_customers",
    "cosine_range_search",
    "event_attribution_windows",
    "doc_length_quantiles",
    "bpe_merges_docs",
    "bpe_encode_docs",
    "embedding_dup_clusters",
    "pmi_collocations_docs",
    "tpch_q7_nation_volume",
    "tpch_q17_small_quantity",
    "tpch_q19_discounted_revenue",
    "embedding_dedup_survivors",
    "ann_recall_at_k",
    "tpch_q8_market_share",
    "tpch_q2_min_cost_supplier",
    "ann_ivfpq_topk",
    # round-5 additions
    # (simhash_near_dup_docs_wide is now the undecorated
    #  simhash_near_dup_docs, r6-verdict demotion)
    "tpch_q9_profit_by_nation",
    "tpch_q11_important_parts",
    "tpch_q12_priority_lines",
    "tpch_q21_waiting_suppliers",
    "source_quality_stats_docs",
    "ann_ivfpq_rerank_topk",
    # round-6 additions
    "ann_int8_topk",
    "source_cap_docs",
    "cms_heavy_hitters_docs",
    "hll_distinct_docs",
    "ann_ivf_persisted_topk",
    "paragraph_dedup_docs",
    "bloom_decontaminate_docs",
    "train_split_docs",
    "quality_resample_docs",
    "event_funnel",
    "retention_cohorts",
    "event_path_topk",
    "semantic_dedup_embeddings",
    "source_similarity_minhash",
    "snapshot_delta_dedup_docs",
    "winsorize_docs",
    "event_rollup_daily",
    "funnel_conversions_events",
    # round-7 additions
    "zorder_events",
    "salted_agg_events",
    "compaction_bins_docs",
    "token_freq_spectrum_docs",
    "global_rank_docs",
    "hard_negative_mining",
    "sparse_cosine_pairs_docs",
    "label_centroid_similarity",
    "bucketed_join_sales",
    "profile_docs",
    "constraint_checks_docs",
    "doc_char_entropy",
    "embedding_outlier_scores",
    "semantic_decontaminate_embeddings",
    "snapshot_neardup_delta_docs",
    "containment_pairs_docs",
    "source_kl_divergence_docs",
    "doc_trigram_backoff",
    "source_length_quantile_sketch",
    "embedding_random_projection",
    # round-8 additions
    "doc_gopher_quality",
    "doc_type_token_ratio",
    "tokenizer_fertility_docs",
    "doc_ngram_novelty",
    "doc_train_split",
    "source_balance_weights_docs",
    "source_dup_rate_docs",
    "dup_group_size_hist_docs",
    "minhash_estimate_error_docs",
    "embedding_gram_matrix",
    "ann_multiprobe_lsh_topk",
    "ann_ivf_incremental_topk",
    "scd2_user_state_events",
    # round-9 additions: the remaining registry queries, so the bench suite
    # covers the FULL 144-query registry (VERDICT r8 "What's missing" #4 —
    # a re-certified heavy query like jaccard_pairs_docs must have a bench
    # row so a future cap regression is visible; the rest are cheap but
    # complete coverage beats per-round judgement calls about "heavy").
    "jaccard_pairs_docs",
    "tpch_q20_part_promotion",
    "curation_pipeline_docs",
    "mp_enrichment",
    "ann_int8_recall_at_k",
    "ann_ivfpq_recall_at_k",
    "ann_ivfpq_rerank_recall_at_k",
    "cleaner_candidates",
    "corpus_vocabulary_docs",
    "dedup_keep_first",
    "dedup_survivors_docs",
    "doc_lang_id",
    "doc_pack_chunks",
    "embedding_norms",
    "embedding_quantize",
    "exclude_fields",
    "file_accounting",
    "minhash_signatures_docs",
    "sanitize_ids",
    "time_bin_hourly",
]


def _sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _proc_cpu() -> tuple[int, int, int]:
    """(total, idle, steal) jiffies across all host CPUs since boot.
    `steal` (field 8) is time the HYPERVISOR descheduled our vCPUs — the
    contention /proc idle accounting cannot see. On this builder (a
    Firecracker guest on a shared host) steal bursts were measured slowing
    identical code 3-8x while the guest looked idle; a run with a high
    steal_frac is not comparable to one without."""
    with open("/proc/stat") as fh:
        nums = [int(x) for x in fh.readline().split()[1:]]
    steal = nums[7] if len(nums) > 7 else 0
    return sum(nums), nums[3] + nums[4], steal


def _load_start() -> dict:
    total, idle, steal = _proc_cpu()
    return {
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "_total": total,
        "_idle": idle,
        "_steal": steal,
        "_t0": time.time(),
    }


def _load_finish(start: dict) -> dict:
    """Host-level contention metadata for the benchmark window. A
    host_busy_frac well above this process's own share (we run local[CPUS] on
    a shared box) means the numbers are contended and ratios vs a clean
    baseline are not comparable; a non-trivial steal_frac means the same
    even when the guest itself is idle."""
    total, idle, steal = _proc_cpu()
    d_total = total - start["_total"]
    d_idle = idle - start["_idle"]
    d_steal = steal - start["_steal"]
    return {
        "loadavg_start": start["loadavg_start"],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "host_busy_frac": round(1.0 - d_idle / d_total, 3) if d_total else None,
        "steal_frac": round(d_steal / d_total, 4) if d_total else None,
        "wall_sec": round(time.time() - start["_t0"], 1),
    }


def _noise_probe(spark) -> float:
    """Fixed CPU-bound job (same plan every time, 32-way parallel, no I/O).
    Its run-to-run spread is the machine's noise floor: query timings are only
    trustworthy down to roughly this relative spread."""
    t0 = time.perf_counter()
    _sink(
        spark.range(0, 100_000_000, 1, 32).select(
            F.sum((F.col("id") * F.lit(2654435761)) % F.lit(1000003)).alias("s")
        )
    )
    return time.perf_counter() - t0


def bench_restructure_e2e(spark, sf_dir: str, workdir: str) -> float:
    """The reference's actual workload: Kafka-sink topic tree -> exact-named
    hourly CSV tree. Measured as one timed unit including the file writes.

    The raw events table has 1500 users spread over 720 hours (~1 row per
    user-hour — one output file per record, which benchmarks the OS, not the
    engine). Real RADAR traffic is few subjects at device sample rates, so the
    input is reshaped to that density: 25 users x 72 hourly bins (~55 records
    per output file, ~1800 files at sf0.1)."""
    ev = load_table(spark, sf_dir, "events")
    topic = "bench_events"
    hours_since = F.floor(
        (F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.lit("2024-01-01 00:00:00")))
        / 3600
    )
    dense_time = (
        F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
        + (hours_since % 72) * 3600
        + (F.unix_micros(F.col("ts")) / F.lit(1e6)) % 3600
    )
    src = ev.select(
        F.struct(
            F.concat(F.lit("p"), (F.col("user_id") % 4).cast("string")).alias(
                "projectId"
            ),
            F.concat(F.lit("u"), (F.col("user_id") % 25).cast("string")).alias("userId"),
            F.lit("s1").alias("sourceId"),
        ).alias("key"),
        F.struct(
            dense_time.alias("time"),
            F.col("event_type").alias("eventType"),
            F.col("value").alias("value"),
        ).alias("value"),
    )
    in_dir = os.path.join(workdir, "in")
    out_dir = os.path.join(workdir, "out")
    tmp_parq = os.path.join(workdir, "tmp_parq")
    src.coalesce(4).write.parquet(tmp_parq)
    tdir = os.path.join(in_dir, topic, "partition=0")
    os.makedirs(tdir)
    for i, part in enumerate(sorted(glob.glob(os.path.join(tmp_parq, "part-*.parquet")))):
        shutil.move(part, os.path.join(tdir, f"{topic}+0+{i * 1000000}+{i * 1000000 + 999999}.parquet"))

    t0 = time.perf_counter()
    plan = RestructurePlan(
        spark, RestructureConfig(input_dir=in_dir, output_dir=out_dir)
    )
    plan.run()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    load0 = _load_start()

    # JVM/codegen warm-up on a trivial plan so q1 doesn't pay session startup.
    _sink(load_table(spark, SF_DIR, "region"))
    noise = [_noise_probe(spark)]

    # Three passes per query, MEDIAN kept, with the query ORDER ROTATED each
    # round (round r starts a third of the way further in). Rationale
    # (VERDICT r2: best-of-2 was defenseless against a loaded box):
    #   - round 1 pays each query's one-time JIT/codegen, rounds 2-3 are
    #     steady state, so the median is a steady-state sample;
    #   - a contention burst hits a contiguous time window = a different
    #     subset of queries each round, so the median per query sheds it;
    #   - rotation also removes positional bias (heap/codegen-cache growth
    #     taxing whoever happens to run last).
    samples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    e2e_samples: list[float] = []
    rounds = 3
    for rnd in range(rounds):
        workdir = tempfile.mkdtemp(prefix="bench_rt_")
        try:
            e2e_samples.append(bench_restructure_e2e(spark, SF_DIR, workdir))
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        cut = rnd * len(BENCH_QUERIES) // rounds
        for name in BENCH_QUERIES[cut:] + BENCH_QUERIES[:cut]:
            fn = queries[name]
            t0 = time.perf_counter()
            _sink(fn(spark, SF_DIR))
            samples[name].append(time.perf_counter() - t0)
        spark._jvm.System.gc()
        noise.append(_noise_probe(spark))

    timings = {"restructure_e2e": round(statistics.median(e2e_samples), 3)}
    spread = {
        "restructure_e2e": round(max(e2e_samples) / min(e2e_samples), 2)
    }
    for name in BENCH_QUERIES:
        timings[name] = round(statistics.median(samples[name]), 3)
        spread[name] = round(max(samples[name]) / min(samples[name]), 2)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Key order matters: the driver keeps only a TAIL buffer of stdout, so
    # r6's shipped artifact truncated to the spread dict (VERDICT r6 "What's
    # wrong" #3).  Diagnostics (load, noise, spread) go FIRST; the graded
    # payload — per-query timings, sf, metric/value — prints LAST so a
    # truncated capture still parses into the headline numbers.
    result = {
        "load": _load_finish(load0),
        "noise_floor": {
            "probe_sec": [round(x, 3) for x in noise],
            "rel_spread": round(
                (max(noise) - min(noise)) / statistics.median(noise), 3
            ),
            # probe[0] pays the probe plan's own codegen/JIT, so rel_spread
            # above can never reach a <1.2 quiet-window gate even on an
            # idle box; the WARM spread (probes after the first) is the
            # actual machine-noise floor. Additions-only diagnostic.
            "rel_spread_warm": round(
                (max(noise[1:]) - min(noise[1:]))
                / statistics.median(noise[1:]),
                3,
            )
            if len(noise) > 2
            else None,
        },
        "spread_max_over_min": spread,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "metric": "headline_suite_total",
        "unit": "sec",
        "value": total,
    }
    print(json.dumps(result))
    # Per-query timings in SMALL independently-parseable lines (VERDICT r11
    # "Next round" #2: the driver could not compute per-query speedups
    # because the single 145-query dict overflows its ~2000-char stdout
    # tail, so per_query/geomean/scaling came back empty two rounds in a
    # row). Each line below is a complete JSON object carrying a slice of
    # the queries dict, centisecond-rounded and space-free (~320 chars), so
    # however much of the tail survives, every UNtruncated line parses and
    # the driver can merge the slices it sees. Additions only: the timed
    # region, the full-result line above, and the compact contract line
    # below are unchanged.
    chunk_size = 12
    names_in_order = list(timings)
    for i in range(0, len(names_in_order), chunk_size):
        part = {
            n: round(timings[n], 2) for n in names_in_order[i : i + chunk_size]
        }
        print(json.dumps({"queries": part}, separators=(",", ":")))
    # The driver parses only the LAST ~2000 chars of stdout and the full
    # 145-query JSON overflows that (VERDICT r9 item 6: BENCH_r09's parsed
    # was null) — so the final stdout line is a compact (<200 char) summary
    # that always fits the tail. Per-query detail lives in the lines above
    # and in the BENCH_LOCAL.json artifact below.
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": "sec",
                "sf": result["sf"],
                "n_queries": len(timings),
            }
        )
    )
    # Self-contained artifact (VERDICT r3 item 8: the driver captures a tail
    # buffer of stdout and r3's shipped BENCH json arrived truncated): the
    # same JSON always lands in a file next to the repo so every round's
    # numbers survive regardless of how stdout is collected.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
        ),
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # stdout already carried the contract line
    if "--compare" in sys.argv:
        idx = sys.argv.index("--compare")
        path = (
            sys.argv[idx + 1]
            if idx + 1 < len(sys.argv)
            else os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
        )
        _print_comparison(result, path)


def _print_comparison(result: dict, baseline_path: str) -> None:
    """Per-query regression report vs a recorded BENCH_r{N}.json (stderr —
    stdout stays the single JSON contract line). Totals are contention-noisy;
    per-query MEDIAN ratios, read alongside the load/noise metadata, are the
    meaningful signal (BASELINE.md §2b). A ratio is only flagged when it
    exceeds 1.5x AND this run's own samples were stable for that query
    (spread <= 1.5) — an unstable sample is contention, not code."""
    with open(baseline_path) as fh:
        raw = json.load(fh)
    parsed = raw.get("parsed", raw)
    base = parsed.get("queries", {})
    timings = result["queries"]
    spread = result.get("spread_max_over_min", {})
    print(f"\n-- vs {os.path.basename(baseline_path)} --", file=sys.stderr)
    here, there = result.get("load", {}), parsed.get("load")
    print(
        f"this run : busy_frac={here.get('host_busy_frac')} "
        f"loadavg={here.get('loadavg_start')}->{here.get('loadavg_end')} "
        f"noise_spread={result.get('noise_floor', {}).get('rel_spread')}",
        file=sys.stderr,
    )
    if there:
        print(
            f"baseline : busy_frac={there.get('host_busy_frac')} "
            f"loadavg={there.get('loadavg_start')}->{there.get('loadavg_end')}",
            file=sys.stderr,
        )
    else:
        print("baseline : (no load metadata recorded)", file=sys.stderr)
    worst = 0.0
    for name, now in timings.items():
        then = base.get(name)
        sp = spread.get(name)
        sp_s = f"  spread x{sp:.2f}" if sp is not None else ""
        if not then:
            print(f"{name:32s} {now:8.3f}s   (new){sp_s}", file=sys.stderr)
            continue
        ratio = now / then
        worst = max(worst, ratio)
        flag = ""
        if ratio > 1.5:
            flag = (
                "  <-- REGRESSION"
                if sp is not None and sp <= 1.5
                else "  <-- slow but unstable samples (contention?)"
            )
        print(
            f"{name:32s} {now:8.3f}s  base {then:8.3f}s  x{ratio:.2f}{sp_s}{flag}",
            file=sys.stderr,
        )
    print(f"worst ratio: x{worst:.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
