"""Polling service mode (SURVEY ST1, reference Application.kt:143-166,
worker/Job.kt:20-64).

The reference's `--service` flag re-runs restructure (and the cleaner, at its
own longer interval) on a fixed schedule, conflated (no overlapping runs) and
serialized through one mutex. A plain driver loop reproduces that exactly:
each iteration is a batch job whose incremental work discovery is the
manifest prune (new/modified files only), so an idle tick costs one listing.

For push-based latency instead of polling, use
`streaming_restructure` (Structured Streaming file source); this loop is the
operational equivalent of the reference's deployment mode.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import SparkSession

from radar_output_restructure_spark.plans.cleaner import CleanerConfig, SourceDataCleaner
from radar_output_restructure_spark.plans.restructure import (
    RestructureConfig,
    RestructurePlan,
)


def run_service(
    spark: SparkSession,
    config: RestructureConfig,
    interval_s: float = 300.0,
    cleaner_interval_s: float = 1260.0,
    cleaner: CleanerConfig | None = None,
    max_iterations: int | None = None,
    on_cycle: Callable[[int, dict], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Run restructure every `interval_s` and the cleaner every
    `cleaner_interval_s` (reference defaults 300 s / 1260 s), serialized
    within the loop like the reference's serviceMutex. Returns iterations
    run. `max_iterations`/`on_cycle`/`sleep` exist for tests and embedding.
    """
    plan = RestructurePlan(spark, config)
    cleaner_job = SourceDataCleaner(spark, config, cleaner) if cleaner else None
    last_clean = 0.0
    i = 0
    while max_iterations is None or i < max_iterations:
        started = time.monotonic()
        result: dict = {"restructure": plan.run()}
        if cleaner_job and time.monotonic() - last_clean >= cleaner_interval_s:
            result["cleaner"] = cleaner_job.run()
            last_clean = time.monotonic()
        i += 1
        if on_cycle:
            on_cycle(i, result)
        if max_iterations is not None and i >= max_iterations:
            break
        # conflated schedule: next run starts interval_s after the previous
        # START, but never overlaps (Job.kt:47-63)
        sleep(max(0.0, interval_s - (time.monotonic() - started)))
    return i
