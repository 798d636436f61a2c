"""Time-series window operators over event streams.

Rolling (time-RANGE) aggregates are the feature-engineering staple the
hourly-bin operators don't cover: "activity in the preceding hour" per
event, not per bin. The plan is one hash shuffle on the keys + a per-key
sort with a RANGE frame — Spark's native window with `rangeBetween` over a
numeric time axis, fully inside codegen, AQE-skew-splittable. No self-join
(the naive events x events formulation is O(n^2) per key at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_window_stats(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 3600,
) -> DataFrame:
    """Per row: count and integer-cents sum of `value` over the preceding
    `window_s` seconds (inclusive both ends, matching SQL
    `RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW`).

    Cents-sum (not a float sum) keeps the result order-independent and
    engine-exact — the same integer-micro trick the text scores use.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    axis = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(axis)
        .rangeBetween(-window_s * 1_000_000, 0)
    )
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return df.select(
        "*",
        F.count(F.lit(1)).over(w).alias(f"n_{window_s}s"),
        F.sum(cents).over(w).alias(f"cents_{window_s}s"),
    )
