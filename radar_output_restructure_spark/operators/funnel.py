"""Product-analytics operators over event streams: sequential funnels,
retention cohorts, and top event paths.

These are the classic clickstream rollups a warehouse team runs daily at
any scale; each is expressed as one or two key-partitioned shuffles with
exact-integer outputs (no float accumulation), so results replay
hash-identically on any engine.

* `funnel` — strictly-ordered step conversion (first qualifying event of
  step i+1 AFTER the user's step-i time). The naive formulation is k
  self-joins of the corpus; this one is a SINGLE shuffle on user: the
  per-user timestamps of each step type aggregate into small sorted
  arrays, and the sequential min-after-min resolves map-side with array
  HOFs (per-user arrays are bounded by that user's per-type event count —
  the lambda cost is per element of those small arrays, not per event).
* `retention_cohorts` — users bucketed by first-signup date, activity
  re-expressed as (cohort, week-offset) distinct-user counts. Two
  aggregations co-partitioned on user, one tiny final rollup.
* `event_path_topk` — the most common length-n consecutive event-type
  sequences: one window (shuffle user + per-key sort on (ts, event_id) —
  a strict total order, so lead() is deterministic under timestamp ties),
  then a count-topk with a lexical tie-break.

No reference analog (the reference restructures records rather than
analyzing them); standard funnel/retention semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def per_user_step_times(
    df: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_col, t0..t{n-1}): each user's first strict-sequence completion
    times — t0 = first step-0 event, t{i} = first step-i event strictly
    after t{i-1}. The SHARED per-user min-after-min chain consumed by both
    `funnel` and the streaming funnel's batch mode (the two copies drifted
    once — one dropped the NULL-user filter — so the chain lives here).

    NULL users are excluded: the oracles' step joins (JOIN USING
    (user_id)) never match NULL = NULL, and a NULL "user" is not a
    coherent funnel subject anyway.
    """
    aggs = [
        F.min(F.when(F.col(type_col) == steps[0], F.col(ts_col))).alias("t0")
    ]
    for i, s in enumerate(steps[1:], start=1):
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
            ).alias(f"a{i}")
        )
    per_user = (
        df.filter(F.col(user_col).isNotNull()).groupBy(user_col).agg(*aggs)
    )
    for i in range(1, len(steps)):
        prev = F.col(f"t{i-1}")
        per_user = per_user.withColumn(
            f"t{i}",
            F.when(
                prev.isNotNull(),
                F.array_min(F.filter(F.col(f"a{i}"), lambda x: x > prev)),
            ),
        )
    return per_user.drop(*[f"a{i}" for i in range(1, len(steps))])



def funnel(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Single-row strict-sequence funnel: n_step_i = users whose first
    qualifying step-i event follows their step-(i-1) time; sum_lag_i_us =
    exact integer microsecond lag summed over converting users."""
    per_user = per_user_step_times(df, steps, user_col, ts_col, type_col)
    out_aggs = []
    for i in range(len(steps)):
        out_aggs.append(
            F.count(F.col(f"t{i}")).cast("bigint").alias(f"n_step{i + 1}")
        )
    for i in range(1, len(steps)):
        out_aggs.append(
            F.sum(
                F.unix_micros(F.col(f"t{i}")) - F.unix_micros(F.col(f"t{i-1}"))
            )
            .cast("bigint")
            .alias(f"sum_lag{i}_us")
        )
    return per_user.agg(*out_aggs)


def retention_cohorts(
    df: DataFrame,
    signup_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(cohort_date, week_offset, n_users): weekly retention matrix.
    cohort_date = the user's first `signup_type` date; each active day
    counts the user into floor(days-since-cohort / 7); pre-signup activity
    is excluded. Distinct-user counts are exact."""
    first = (
        df.filter(F.col(type_col) == signup_type)
        .groupBy(user_col)
        .agg(F.min(F.to_date(ts_col)).alias("cohort_date"))
    )
    activity = df.select(
        F.col(user_col), F.to_date(ts_col).alias("active_date")
    ).distinct()
    joined = activity.join(first, user_col)
    offset = (
        F.floor(F.datediff("active_date", "cohort_date") / 7).cast("int")
    ).alias("week_offset")
    return (
        joined.filter(F.datediff("active_date", "cohort_date") >= 0)
        .select(user_col, "cohort_date", offset)
        .groupBy("cohort_date", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).cast("bigint").alias("n_users"))
    )


def event_path_topk(
    df: DataFrame,
    n: int = 3,
    k: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(path, n_paths): the `k` most common length-`n` consecutive
    event-type sequences across users, tie-broken lexically. Ordering is
    (ts, event_id) — a strict total order, so the window is deterministic
    even when timestamps collide."""
    # NULL ts dropped before the window: the engines' NULL sort orders
    # differ, which would change every lead() neighborhood
    df = df.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    stepped = df.select(
        *[p.alias(f"s{i}") for i, p in enumerate(parts)]
    )
    # EVERY step must be non-null, not just the last lead: a NULL
    # event_type mid-path would pass an s{n-1}-only check and concat_ws
    # would skip it, corrupting (a, NULL, c) into the colliding path
    # 'a>c' — and diverging from the oracle, whose || chain nulls out
    for i in range(n):
        stepped = stepped.filter(F.col(f"s{i}").isNotNull())
    path = F.concat_ws(">", *[F.col(f"s{i}") for i in range(n)])
    return (
        stepped.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), F.col("path").asc())
        .limit(k)
    )


def event_rollup_daily(ev: DataFrame) -> DataFrame:
    """(event_type, event_date, n_events, sum_value_micro, gid): the
    multi-level daily rollup — per (type, day), per type, and the grand
    total in ONE pass via ROLLUP, with `gid` (grouping_id bitmask,
    first column = MSB — the shared Spark/Postgres/DuckDB convention)
    disambiguating real dimension values from the '(all)' subtotal rows.

    Spark expands ROLLUP before aggregation but the aggregate is still
    map-side combined per grouping set, so the corpus is read ONCE and the
    shuffle carries only (groups x levels) partial rows — at 100 TB this
    beats three separate aggregations by 3x on scan alone. Values sum as
    integer micros (round(value * 1e6), HALF_UP — the repo-wide
    cents/micros convention; a floor would truncate ~half of all
    two-decimal values one micro low because their nearest double sits
    just under the decimal): exact, associative, engine-equal;
    a float sum over millions of rows is neither.
    """
    base = ev.select(
        "event_type",
        F.col("ts").cast("date").cast("string").alias("event_date"),
        # saturating clamp at +/-2^62 (exactly representable): an ANSI
        # BIGINT cast of round(1e15 * 1e6) would fail the job
        F.least(
            F.greatest(
                F.round(F.col("value") * 1_000_000, 0),
                F.lit(-4611686018427387904.0),
            ),
            F.lit(4611686018427387904.0),
        )
        .cast("bigint")
        .alias("__v"),
    )
    return (
        base.rollup("event_type", "event_date")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("__v").cast("bigint").alias("sum_value_micro"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("event_date", F.lit("(all)")).alias("event_date"),
            "n_events",
            "sum_value_micro",
            "gid",
        )
    )
