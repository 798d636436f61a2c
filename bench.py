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
]


def _sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


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

    # JVM/codegen warm-up on a trivial plan so q1 doesn't pay session startup.
    _sink(load_table(spark, SF_DIR, "region"))

    timings: dict[str, float] = {}
    workdir = tempfile.mkdtemp(prefix="bench_rt_")
    try:
        timings["restructure_e2e"] = round(
            bench_restructure_e2e(spark, SF_DIR, workdir), 3
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    # two passes per query, keep the fastest: the first pass pays one-time
    # JIT/codegen for that query's expressions; the second is steady-state,
    # which is what a long-running production job actually sees. A GC nudge
    # between queries keeps heap growth from earlier queries (codegen
    # classes, checkpoint blocks) from taxing later ones.
    for name in BENCH_QUERIES:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _sink(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    if "--compare" in sys.argv:
        idx = sys.argv.index("--compare")
        path = (
            sys.argv[idx + 1]
            if idx + 1 < len(sys.argv)
            else os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
        )
        _print_comparison(timings, path)


def _print_comparison(timings: dict[str, float], baseline_path: str) -> None:
    """Per-query regression report vs a recorded BENCH_r{N}.json (stderr —
    stdout stays the single JSON contract line). Totals are contention-noisy;
    per-query ratios are the meaningful signal (BASELINE.md §2b)."""
    with open(baseline_path) as fh:
        raw = json.load(fh)
    base = raw.get("parsed", raw).get("queries", {})
    print(f"\n-- vs {os.path.basename(baseline_path)} --", file=sys.stderr)
    worst = 0.0
    for name, now in timings.items():
        then = base.get(name)
        if not then:
            print(f"{name:32s} {now:8.3f}s   (new)", file=sys.stderr)
            continue
        ratio = now / then
        worst = max(worst, ratio)
        flag = "  <-- REGRESSION" if ratio > 1.5 else ""
        print(
            f"{name:32s} {now:8.3f}s  base {then:8.3f}s  x{ratio:.2f}{flag}",
            file=sys.stderr,
        )
    print(f"worst ratio: x{worst:.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
