"""Event-time binning (SURVEY §2.3 G2/G3).

The reference buckets every record into an hourly UTC tumbling window whose
label is `yyyyMMdd_HH'00'` (path/FixedPathFormatterPlugin.kt:55-75), with the
pattern configurable via `timeBinFormat`; null time -> "unknown-time"
(FixedPathFormatterPlugin.kt:28-33). The `${time:<fmt>}` path plugin
(path/TimePathFormatterPlugin.kt:7-23) formats arbitrary Java patterns.

Spark-first: `date_format` over a timestamp Column — equivalent to a 1-hour
tumbling `window()` but cheaper (no struct construction) and usable both as a
partition column and as a group key. Java and Spark share the
DateTimeFormatter pattern language, so patterns pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from radar_output_restructure_spark.functions.sanitize import UNKNOWN_TIME

DEFAULT_BIN_FORMAT = "yyyyMMdd_HH'00'"


def time_bin(ts: Column, fmt: str = DEFAULT_BIN_FORMAT, default: str = UNKNOWN_TIME) -> Column:
    """Format `ts` (UTC session timezone) into the reference's time-bin label."""
    return F.coalesce(F.date_format(ts, fmt), F.lit(default))


def time_segment(ts: Column, fmt: str) -> Column:
    """`${time:<fmt>}` path plugin: arbitrary pattern segment."""
    return F.coalesce(F.date_format(ts, fmt), F.lit(UNKNOWN_TIME))
