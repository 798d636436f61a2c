"""Product-analytics queries over `events`: funnels, retention, paths.

Same contract as queries.py — every Spark builder is paired with a DuckDB
oracle producing identical values; lags and counts are exact integers
(microseconds / bigint counts), never accumulated floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radar_output_restructure_spark.queries import register
from radar_output_restructure_spark.sources.tables import load_table

FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "event_funnel",
    f"""
    WITH s1 AS (
      -- NULL users excluded (mirrors the Spark operator): the later
      -- JOIN USING steps never match NULL anyway, so counting the NULL
      -- group only in n_step1 would be internally inconsistent
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' AND user_id IS NOT NULL
      GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.ts1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.ts2
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_step1,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_step2,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_step3,
           (SELECT CAST(sum(epoch_us(ts2) - epoch_us(ts1)) AS BIGINT)
            FROM s2 JOIN s1 USING (user_id)) AS sum_lag1_us,
           (SELECT CAST(sum(epoch_us(ts3) - epoch_us(ts2)) AS BIGINT)
            FROM s3 JOIN s2 USING (user_id)) AS sum_lag2_us
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence view->click->purchase funnel: per-step converting
    user counts + exact integer microsecond lag sums. ONE shuffle on
    user_id (per-user step timestamps aggregate into small sorted arrays;
    the sequential min-after-min resolves map-side) versus the oracle's k
    chained self-joins (operators/funnel.funnel)."""
    from radar_output_restructure_spark.operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, steps=FUNNEL_STEPS)


@register(
    "retention_cohorts",
    """
    WITH first AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
    ),
    j AS (
      SELECT a.user_id, f.cohort_date,
             datediff('day', f.cohort_date, a.active_date) AS dd
      FROM activity a JOIN first f USING (user_id)
    )
    SELECT CAST(cohort_date AS VARCHAR) AS cohort_date,
           CAST(dd // 7 AS INT) AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j WHERE dd >= 0
    GROUP BY cohort_date, week_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users cohorted by first-signup date,
    counted into floor(days-since-cohort/7) buckets for every active day.
    Two user-keyed aggregations + one tiny rollup — no event-by-event
    self-join (operators/funnel.retention_cohorts)."""
    from radar_output_restructure_spark.operators.funnel import (
        retention_cohorts,
    )

    ev = load_table(spark, sf_dir, "events")
    out = retention_cohorts(ev)
    # DATE values serialize engine-differently in the compare harness;
    # ISO-string form is identical on both sides
    return out.withColumn("cohort_date", F.col("cohort_date").cast("string"))


@register(
    "event_path_topk",
    """
    WITH s AS (
      SELECT event_type AS s0,
             lead(event_type, 1) OVER w AS s1,
             lead(event_type, 2) OVER w AS s2
      -- NULL ts excluded: the engines' NULL sort orders differ (Spark
      -- NULLS FIRST asc, DuckDB NULLS LAST), which would change every
      -- lead() neighborhood; an unordered event cannot sit in a path
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT s0 || '>' || s1 || '>' || s2 AS path,
           CAST(count(*) AS BIGINT) AS n_paths
    -- every step non-null (mirrors the Spark operator): a NULL mid-path
    -- nulls the || chain and would otherwise form a NULL-path group
    FROM s WHERE s0 IS NOT NULL AND s1 IS NOT NULL AND s2 IS NOT NULL
    GROUP BY path
    ORDER BY n_paths DESC, path ASC
    LIMIT 10
    """,
)
def q_event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 consecutive event-type trigrams: one window over (ts,
    event_id) — a strict total order, so lead() is deterministic under
    timestamp ties — then a count-topk with lexical tie-break
    (operators/funnel.event_path_topk)."""
    from radar_output_restructure_spark.operators.funnel import (
        event_path_topk,
    )

    ev = load_table(spark, sf_dir, "events")
    return event_path_topk(ev)


@register(
    "event_rollup_daily",
    """
    WITH b AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
             -- saturating clamp at +/-2^62: a 1e15 value would overflow
             -- the BIGINT cast (error under ANSI Spark, error in DuckDB)
             CAST(least(greatest(round(value * 1000000, 0),
                                 -4611686018427387904.0),
                        4611686018427387904.0) AS BIGINT) AS v_micro
      FROM events
    )
    SELECT coalesce(event_type, '(all)') AS event_type,
           coalesce(event_date, '(all)') AS event_date,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(v_micro) AS BIGINT) AS sum_value_micro,
           CAST(GROUPING(event_type, event_date) AS INT) AS gid
    FROM b GROUP BY ROLLUP(event_type, event_date)
    """,
)
def q_event_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/type/grand-total event rollup in one scan: ROLLUP grouping
    sets with the grouping_id bitmask (identical Spark/DuckDB convention,
    asserted by the oracle), values summed as exact integer micros
    (operators/funnel.event_rollup_daily)."""
    from radar_output_restructure_spark.operators.funnel import (
        event_rollup_daily,
    )

    ev = load_table(spark, sf_dir, "events")
    return event_rollup_daily(ev)


@register(
    "funnel_conversions_events",
    f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t0
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t1
      GROUP BY e.user_id
    )
    SELECT s3.user_id,
           CAST(t2 AS VARCHAR) AS converted_at,
           CAST(epoch_us(t1) - epoch_us(t0) AS BIGINT) AS lag1_us,
           CAST(epoch_us(t2) - epoch_us(t1) AS BIGINT) AS lag2_us
    FROM s3 JOIN s2 USING (user_id) JOIN s1 USING (user_id)
    """,
)
def q_funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel conversions (the row-level face of `event_funnel`):
    first strict view->click->purchase completion per user with exact
    integer microsecond lags. This is the BATCH mode of the dual-mode
    streaming operator — the stateful streaming path
    (streaming/windows.streaming_funnel_conversions) emits the identical
    rows per micro-batch, parity-tested across a batch split."""
    from radar_output_restructure_spark.streaming.windows import (
        streaming_funnel_conversions,
    )

    ev = load_table(spark, sf_dir, "events")
    out = streaming_funnel_conversions(ev, steps=FUNNEL_STEPS)
    return out.withColumn(
        "converted_at", F.col("converted_at").cast("string")
    )


# ---------------------------------------------------------------------------
# lakehouse layout + skew mitigation
# ---------------------------------------------------------------------------

from radar_output_restructure_spark.operators.zorder import (  # noqa: E402
    z_order_stats,
    z_order_stats_sql,
)

_Z_X = "user_id % 256"
_Z_HOUR = "(epoch_us(ts) - (epoch_us(ts) % 3600000000)) / 3600000000"
_Z_Y_DUCK = f"CAST({_Z_HOUR} AS BIGINT) % 256"
_Z_Y_SPARK = _Z_Y_DUCK.replace("epoch_us(ts)", "unix_micros(ts)")


@register(
    "zorder_events",
    z_order_stats_sql("events", _Z_X, _Z_Y_DUCK, bucket_bits=6, bits=8),
)
def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit over events: interleave 8-bit
    (user bucket, hour bucket) keys, cut the z-space into 64 equal ranges
    ("files" of a z-ordered write), and emit each range's row count +
    min/max of BOTH dimensions — the file-statistics table that shows why
    the layout skips on either predicate (every bucket is a 32x32
    rectangle, so a user_id filter prunes ~31/32 of files AND an hour
    filter prunes ~31/32). Map-only bit arithmetic (whole-stage codegen,
    identical expression text in the DuckDB oracle) + one 64-group
    map-side-combined groupBy (operators/zorder.z_order_stats)."""
    ev = load_table(spark, sf_dir, "events")
    return z_order_stats(ev, _Z_X, _Z_Y_SPARK, bucket_bits=6, bits=8)


@register(
    "salted_agg_events",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM events
    GROUP BY event_type
    """,
)
def q_salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via two-stage salting: event_type has a
    handful of giant groups, and the COUNT(DISTINCT user_id) leg is the
    part plain map-side combining can't save (Spark plans it as Expand +
    shuffle whose reduce side still concentrates each key's whole distinct
    set on one task). The salt is pmod(hash-of-user_id, 32), a pure
    function of the distinct column, so every sub-group counts a DISJOINT
    user set and summing the 32 partials per key is EXACT — the oracle is
    the plain one-stage GROUP BY. Stage 2 re-aggregates |keys| x 32 rows
    (kilobytes at any corpus size); the win is stage 1's reduce
    parallelism (operators/skew.salted_agg)."""
    from radar_output_restructure_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev,
        keys=["event_type"],
        aggs=[
            ("count", F.lit(1), "n_events"),
            ("count_distinct", F.col("user_id"), "n_users"),
            (
                "sum",
                F.round(F.col("value") * 100, 0).cast("long"),
                "sum_value_cents",
            ),
        ],
        salt_col=F.col("user_id"),
        num_salts=32,
    )


@register(
    "scd2_user_state_events",
    """
    WITH ev AS (
      SELECT user_id AS key, event_type AS state, ts, event_id FROM events
    ),
    marked AS (
      -- null-safe island break (mirrors the Spark operator's eqNullSafe):
      -- a state->NULL transition must OPEN an island, and the first row
      -- always opens one
      SELECT key, state, ts, event_id,
             CASE WHEN row_number() OVER w = 1
                    OR lag(state) OVER w IS DISTINCT FROM state
                  THEN 1 ELSE 0 END AS chg
      FROM (SELECT * FROM ev WHERE ts IS NOT NULL) ev2
      WINDOW w AS (PARTITION BY key ORDER BY ts, event_id)
    ),
    isl AS (
      SELECT key, state, ts, chg,
             sum(chg) OVER (PARTITION BY key ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    agg AS (
      SELECT key, island, min(state) AS state, min(ts) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM isl GROUP BY key, island
    )
    SELECT key, state, valid_from,
           lead(valid_from) OVER (PARTITION BY key ORDER BY island)
             AS valid_to,
           n_events
    FROM agg
    """,
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD intervals of each user's event_type: gaps-and-islands in
    codegen windows, ONE hash shuffle on the key reused by every window
    and the island aggregation; latest interval open (valid_to NULL)
    (operators/timeseries.scd2_intervals)."""
    from radar_output_restructure_spark.operators.timeseries import (
        scd2_intervals,
    )

    ev = load_table(spark, sf_dir, "events")
    return scd2_intervals(ev)
