"""CLI entry point: `python -m radar_output_restructure_spark <config.yml>`.

Mirrors the reference's invocation (Application.kt:198-240 +
config/CommandLineArgs.kt): a YAML config in the reference's own shape,
plus the most-used flag overrides. Runs one restructure pass per input (and
the cleaner when enabled), or loops as a service.
"""

from __future__ import annotations

import argparse
import sys

from radar_output_restructure_spark.config import AppConfig, apply_env, load_config
from radar_output_restructure_spark.plans.cleaner import SourceDataCleaner
from radar_output_restructure_spark.plans.restructure import RestructurePlan
from radar_output_restructure_spark.session import get_spark
from radar_output_restructure_spark.streaming.service import run_service


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="radar-output-restructure-spark",
        description="Restructure Kafka-sink topic trees into per-subject output trees.",
    )
    p.add_argument("config", nargs="?", help="YAML config (reference restructure.yml shape)")
    p.add_argument("-i", "--input", action="append", default=None,
                   help="input directory (repeatable; overrides paths.inputs)")
    p.add_argument("-o", "--output", default=None, help="output directory")
    p.add_argument("--format", choices=["csv", "json"], default=None)
    p.add_argument("--compression", choices=["none", "gzip", "zip"], default=None)
    p.add_argument("--deduplicate", action="store_true", default=None)
    p.add_argument("-S", "--service", action="store_true", default=None,
                   help="run as a polling service")
    p.add_argument("--interval", type=float, default=None, help="service poll seconds")
    p.add_argument("--max-iterations", type=int, default=None,
                   help="stop the service loop after N cycles (testing)")
    p.add_argument("--clean", action="store_true", default=None,
                   help="also run the cleaner")
    p.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--timings", action="store_true",
                   help="collect and print per-stage driver timings "
                        "(A4, reference util/Timer.kt)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    cfg = load_config(args.config) if args.config else AppConfig()
    apply_env(cfg)
    if args.input:
        cfg.inputs = args.input
    if args.output:
        cfg.restructure.output_dir = args.output
    if args.format:
        cfg.restructure.output_format = args.format
    if args.compression:
        cfg.restructure.compression = (
            None if args.compression == "none" else args.compression
        )
    if args.deduplicate:
        cfg.restructure.dedup.enable = True
    if args.service is not None:
        cfg.service.enable = args.service
    if args.interval is not None:
        cfg.service.interval_s = args.interval
    if args.clean is not None:
        cfg.service.cleaner_enable = args.clean
    if not cfg.inputs:
        print("error: no input directories (config paths.inputs or --input)", file=sys.stderr)
        return 2

    from radar_output_restructure_spark.timer import Timer

    if args.timings:
        Timer.enabled = True
    spark = get_spark(master=args.master)
    try:
        if cfg.service.enable:
            # ONE service loop covering every input per cycle — a
            # loop-per-input would run the first input forever and the
            # rest never (the reference service covers all inputs each
            # cycle); worker.enable=false gives the cleaner-only service
            run_service(
                spark,
                [cfg.for_input(d) for d in cfg.inputs],
                interval_s=cfg.service.interval_s,
                cleaner_interval_s=cfg.service.cleaner_interval_s,
                cleaner=cfg.cleaner if cfg.service.cleaner_enable else None,
                max_iterations=args.max_iterations,
                worker_enable=cfg.service.worker_enable,
                on_cycle=lambda i, r: print(
                    f"[cycle {i}] "
                    + ", ".join(
                        f"{t}: {len(files)} files" for t, files in r["restructure"].items()
                    )
                ),
            )
            if args.timings:
                print(Timer.report())
            return 0
        for input_dir in cfg.inputs:
            rcfg = cfg.for_input(input_dir)
            if cfg.service.worker_enable:
                result = RestructurePlan(spark, rcfg).run()
                for topic, files in result.items():
                    print(f"{topic}: wrote {len(files)} files")
            if cfg.service.cleaner_enable:
                cleaned = SourceDataCleaner(spark, rcfg, cfg.cleaner).run()
                for topic, res in cleaned.items():
                    print(
                        f"{topic}: removed {len(res['deleted'])}, "
                        f"revoked {len(res['revoked'])}"
                    )
        if args.timings:
            print(Timer.report())
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
