#!/usr/bin/env python
"""Per-query optimization profiler (guide §1: measure first).

For each named query (default: all registry queries), times separately:
  * build  — calling the query fn (Python plan construction + analysis +
             any eager driver-side work the operator does internally);
  * exec   — the noop-sink materialization of the returned DataFrame
             (median of --runs samples, same methodology as bench.py).

Writes one JSON line per query to stdout and optionally the
explain("formatted") text to --plans-dir/<query>.txt.

Usage:
  python scripts/profile_queries.py [--sf DIR] [--runs N]
      [--plans-dir DIR] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from radar_output_restructure_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry_mod.queries()
    names = args.queries or list(registry)
    bad = [n for n in names if n not in registry]
    if bad:
        sys.exit(f"unknown queries: {bad}")

    # warm-up
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    for name in names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        builds, execs = [], []
        df = None
        for r in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        if args.plans_dir and df is not None:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        print(
            json.dumps(
                {
                    "query": name,
                    "build_med": round(statistics.median(builds), 3),
                    "exec_med": round(statistics.median(execs), 3),
                    "total_med": round(
                        statistics.median(
                            [b + e for b, e in zip(builds, execs)]
                        ),
                        3,
                    ),
                    "build": [round(x, 3) for x in builds],
                    "exec": [round(x, 3) for x in execs],
                }
            ),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
