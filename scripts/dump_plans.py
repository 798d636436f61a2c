#!/usr/bin/env python
"""Dump explain("formatted") for registry queries to a directory.

Plan-only capture (no noop execution) so before/after plan diffs can be
taken independently of benchmarking. Note: queries whose build phase is
eager (k-means training, persisted-index builds) still run those jobs.

Usage: python scripts/dump_plans.py --out DIR [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
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
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        t0 = time.perf_counter()
        df = registry[name](spark, args.sf)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(args.out, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
