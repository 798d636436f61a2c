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

    Key skew: a hot key's rows land in ONE window task (per-key RANGE
    state cannot be split), so skew costs a straggler, never a shuffle
    blow-up. Measured under the hot-user stress mode (one user holding
    10% of ALL events, 10x tiling — scripts/scale_stress.py --hotuser)
    the bound is x1.75 overall, i.e. under the 2x line, so the
    decomposable mitigation — count/sum decompose over time slices:
    salt each key's rows into hour-aligned slices, compute slice
    partials, then merge each row's frame from O(1) adjacent partials —
    is deliberately NOT implemented (r8 verdict item 5: "skip if the
    measured straggler bound at 10x stays <2x — document instead").
    It is the known lever if a deployment's skew is worse than 10%/key;
    for decomposable aggregates without the per-row frame requirement,
    `operators/skew.salted_agg` already ships the salted two-pass.
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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | str,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_s: int,
) -> DataFrame:
    """Non-equi time-interval join, made shuffle-bounded by bucketization:
    every left row whose `left_ts` falls in a right row's half-open
    [start_col, end_col) interval, matched within `keys`.

    Spark has no native range-join optimization — the naive formulation
    `l JOIN r ON l.k = r.k AND l.ts BETWEEN r.s AND r.e` degenerates to a
    per-key cartesian filter (every left row of a key against every right
    interval of that key: hot keys go quadratic at 100 TB). The standard
    fix, expressed declaratively so Catalyst still prunes/pushes:

    * left rows get ONE bucket: floor(unix(ts) / bucket_s);
    * right intervals EXPLODE to the buckets they overlap (sequence() —
      ceil(len/bucket_s)+1 rows, a small constant when bucket_s is chosen
      near the interval length);
    * equi-join on (keys..., bucket) + the residual BETWEEN predicate.

    Each (left row, interval) pair meets in exactly one bucket — the left
    row's own — so no post-join distinct is needed; output cardinality
    equals the naive join's exactly. Join parallelism follows (key, bucket)
    instead of key, so a hot key's intervals spread over time buckets and
    AQE's skew split has a real axis to cut on.

    `bucket_s` trades explode factor (long intervals over small buckets)
    against bucket occupancy (short buckets gather fewer rows); the sweet
    spot is bucket_s ~ typical interval length.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    lb = F.floor(F.unix_micros(F.col(left_ts)) / (bucket_s * 1_000_000))
    l_df = left.withColumn("__bucket", lb.cast("long"))
    rs = F.unix_micros(F.col(start_col))
    re_ = F.unix_micros(F.col(end_col))
    # empty/inverted intervals (end <= start) are dropped BEFORE the
    # explode: Spark's sequence(start, stop) silently generates a
    # DESCENDING array when start > stop, so one malformed row (say an
    # epoch-0 sentinel end under a 2026 start) would explode into ~500k
    # junk buckets per row — the residual filter would discard them all,
    # but only after the memory blow-up (same hazard dedup_scale guards
    # at its sequence(1, n-k+1) sites)
    r_df = right.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(rs / (bucket_s * 1_000_000)).cast("long"),
                # half-open end: the end-instant's own bucket only matters
                # when the interval extends into it
                F.floor((re_ - 1) / (bucket_s * 1_000_000)).cast("long"),
            )
        ),
    )
    residual = (F.col(left_ts) >= F.col(start_col)) & (
        F.col(left_ts) < F.col(end_col)
    )
    return l_df.join(r_df, [*keys, "__bucket"]).filter(residual).drop("__bucket")


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(key, state, valid_from, valid_to, n_events): type-2 slowly-changing-
    dimension intervals from an event stream — consecutive events with the
    SAME state collapse into one validity interval; an interval closes the
    instant a DIFFERENT state arrives (half-open [from, to)); the latest
    interval stays open (valid_to NULL). The standard warehouse build for
    "what was this entity's state at time t" joins.

    Gaps-and-islands entirely inside codegen windows: lag() marks change
    points, a running SUM numbers the islands, per-island bounds come from
    windows over (key, island) — which Catalyst serves from the SAME
    HashPartitioning(key) exchange (a partitioning on a subset of the
    clustering keys satisfies the distribution), so island reduction costs
    a sort, not a shuffle — and lead() over the per-key island frame
    closes each interval. ONE hash shuffle of event rows total (verified
    in tests/test_r8_ops.py on the physical plan); no self-join. Ordering
    ties on `ts` break by `tie_col` so the island numbering — and
    therefore every interval — is deterministic under any arrival order.
    """
    # NULL event times are dropped: a state observation without a time
    # cannot bound an interval, and the engines' NULL sort orders differ
    # (Spark NULLS FIRST asc, DuckDB NULLS LAST) so islands would diverge
    df = df.filter(F.col(ts_col).isNotNull())
    order = [F.col(ts_col).asc(), F.col(tie_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    # null-safe island break (~eqNullSafe): with a plain !=, a
    # state->NULL transition evaluates to (false OR NULL) = NULL, the
    # running sum skips it, and the NULL-state event is silently absorbed
    # into the previous interval while NULL->NULL starts a fresh island —
    # intervals would misstate validity whenever state_col is nullable.
    # First row: lag is NULL over a non-null state -> NOT(eqNullSafe) = 1,
    # same as the old isNull() arm; a first-row NULL state also opens its
    # own island (lag NULL <=> state NULL is true... except lag's NULL
    # here means "no previous row", so force the first row open).
    w_prev = F.lag(state_col).over(w)
    first_row = F.row_number().over(w) == 1
    changed = (
        first_row | ~w_prev.eqNullSafe(F.col(state_col))
    ).cast("long")
    # the key column keeps its ORIGINAL name until the final projection:
    # renaming it mid-plan makes the (key, island) windows' clustering
    # requirement reference a new attribute, and Catalyst then inserts a
    # fresh Exchange instead of reusing HashPartitioning(key_col)
    islands = df.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("__ts"),
        F.col(tie_col).alias("__tie"),
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__island"),
    )
    wki = Window.partitionBy(key_col, "__island")
    wko = wki.orderBy(F.col("__ts").asc(), F.col("__tie").asc())
    per_island = (
        islands.select(
            F.col(key_col),
            "state",
            "__island",
            F.min("__ts").over(wki).alias("valid_from"),
            F.count(F.lit(1)).over(wki).cast("bigint").alias("n_events"),
            F.row_number().over(wko).alias("__rn"),
        )
        # one row per island; its own `state` IS the island state (constant
        # within an island by construction of the change-point sum)
        .filter(F.col("__rn") == 1)
    )
    wi = Window.partitionBy(key_col).orderBy(F.col("__island").asc())
    return per_island.select(
        F.col(key_col).alias("key"),
        F.col("state"),
        F.col("valid_from"),
        F.lead("valid_from").over(wi).alias("valid_to"),
        F.col("n_events"),
    )
