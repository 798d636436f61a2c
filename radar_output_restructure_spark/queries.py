"""Query registry: every operator from SURVEY §2 (plus the training-data
extensions) as a (Spark DataFrame builder, DuckDB oracle SQL) pair.

The driver runs each Spark query and its oracle side-by-side at sf=0.01 and
compares row count + schema + order-insensitive value hash, so both sides
must produce IDENTICAL values:

* double sums use the "cents trick": per-row `round(x*100)` -> bigint sums
  (per-row double arithmetic is deterministic and engine-identical; only
  multi-row float accumulation is not).
* ratios/products of per-row values are rounded to 6 decimals in BOTH.
* every hash is the shared md5-Horner (operators/text.md5_horner_sql), which
  renders to the same SQL text in both dialects.

The `events` table doubles as the reference's record stream (FIXTURES.md F8):
`key = struct(projectId, userId, sourceId)` synthesized from user_id,
`value = struct(time, eventType, value, props)` from the payload columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radar_output_restructure_spark.functions.flatten import flatten
from radar_output_restructure_spark.functions.sanitize import sanitize_id
from radar_output_restructure_spark.functions.timeutil import event_time
from radar_output_restructure_spark.operators.dedup import dedup_keep_first, dedup_keep_last
from radar_output_restructure_spark.operators.timebin import time_bin
from radar_output_restructure_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def cents(col):
    """Engine-identical exact money: per-row round to cents, bigint."""
    return F.round(col * 100, 0).cast("long")


# ---------------------------------------------------------------------------
# The synthesized Kafka-sink topic view over `events` (FIXTURES.md F8)
# ---------------------------------------------------------------------------


def events_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    time_s = F.unix_micros(ev.ts) / F.lit(1_000_000.0)
    return ev.select(
        F.struct(
            F.when(ev.user_id % 10 == 0, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("proj "), (ev.user_id % 3).cast("string")))
            .alias("projectId"),
            F.concat(F.lit("user."), ev.user_id.cast("string")).alias("userId"),
            F.concat(F.lit("src-"), (ev.user_id % 5).cast("string")).alias("sourceId"),
        ).alias("key"),
        F.struct(
            time_s.alias("time"),
            ev.event_type.alias("eventType"),
            ev.value.alias("value"),
            ev.props.alias("props"),
        ).alias("value"),
        ev.event_id,
        ev.user_id,
        ev.ts,
    )


# SQL fragments shared by the oracles (DuckDB dialect)
_SQL_TIME_S = "(epoch_us(ts) / 1000000.0)"
# NULL user_id sanitizes to the reference defaults (sanitize_id's
# 'unknown-*'), like the Spark builders
_SQL_PROJECT = (
    "CASE WHEN user_id IS NULL OR user_id % 10 = 0 THEN 'unknown-project' "
    "ELSE 'proj' || CAST(user_id % 3 AS VARCHAR) END"
)
_SQL_USER = (
    "coalesce('user' || CAST(user_id AS VARCHAR), 'unknown-user')"
)
# NULL ts renders the reference's UNKNOWN_TIME default, like
# operators/timebin.time_bin's coalesce
_SQL_BIN = (
    "coalesce(strftime(ts, '%Y%m%d_%H') || '00', 'unknown-time')"
)


# ---------------------------------------------------------------------------
# G1/G2/P8: the flagship restructure routing query
# ---------------------------------------------------------------------------


@register(
    "restructure_flagship",
    f"""
    SELECT {_SQL_PROJECT} AS project,
           {_SQL_USER} AS "user",
           'events_topic' AS topic,
           {_SQL_BIN} AS bin,
           count(*) AS n_records,
           round(min({_SQL_TIME_S}), 6) AS min_time_s,
           round(max({_SQL_TIME_S}), 6) AS max_time_s
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
)
def q_restructure_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record->path routing: sanitized ids + hourly time bin + per-file stats.

    Reference G1 (path/RecordPathFactory.kt:66-105) + G2 hourly bin
    (path/FixedPathFormatterPlugin.kt:55-75) + P8 sanitize
    (path/RecordPathFactory.kt:119-125), re-expressed as one groupBy.
    """
    df = events_topic(spark, sf_dir)
    ts = event_time(df)
    time_s = F.unix_micros(ts) / F.lit(1_000_000.0)
    return (
        df.withColumn("project", sanitize_id(F.col("key.projectId"), "unknown-project"))
        .withColumn("user", sanitize_id(F.col("key.userId"), "unknown-user"))
        .withColumn("topic", F.lit("events_topic"))
        .withColumn("bin", time_bin(ts))
        .withColumn("time_s", time_s)
        .groupBy("project", "user", "topic", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.round(F.min("time_s"), 6).alias("min_time_s"),
            F.round(F.max("time_s"), 6).alias("max_time_s"),
        )
    )


# ---------------------------------------------------------------------------
# §1.1: event-time coalesce cascade
# ---------------------------------------------------------------------------


@register(
    "event_time_cascade",
    f"""
    WITH c AS (
      SELECT event_id,
             CASE WHEN event_id % 4 = 0 THEN {_SQL_TIME_S} END AS v_time,
             CASE WHEN event_id % 4 <= 1 THEN {_SQL_TIME_S} + 1.5 END AS k_timestart,
             CASE WHEN event_id % 4 <= 2 THEN epoch_us(ts) // 1000 + 2000 END AS k_start_ms,
             {_SQL_TIME_S} + 3.25 AS v_timereceived
      FROM events
    )
    SELECT event_id,
           round(coalesce(v_time, k_timestart, k_start_ms / 1000.0,
                          v_timereceived), 6) AS event_time_s
    FROM c
    """,
)
def q_event_time_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeUtil.kt:26-57 cascade: value.time > key.timeStart > key.start(ms)
    > value.timeReceived, exercised via modulo-derived null patterns."""
    ev = load_table(spark, sf_dir, "events")
    time_s = F.unix_micros(ev.ts) / F.lit(1_000_000.0)
    df = ev.select(
        "event_id",
        F.struct(
            F.when(ev.event_id % 4 <= 1, time_s + 1.5).alias("timeStart"),
            F.when(
                ev.event_id % 4 <= 2, F.expr("unix_micros(ts) DIV 1000") + 2000
            ).alias("start"),
        ).alias("key"),
        F.struct(
            F.when(ev.event_id % 4 == 0, time_s).alias("time"),
            (time_s + 3.25).alias("timeReceived"),
        ).alias("value"),
    )
    ts = event_time(df)
    return df.select(
        "event_id",
        F.round(F.unix_micros(ts) / F.lit(1_000_000.0), 6).alias("event_time_s"),
    )


# ---------------------------------------------------------------------------
# G2: hourly tumbling time-bin aggregation
# ---------------------------------------------------------------------------


@register(
    "time_bin_hourly",
    f"""
    SELECT user_id, {_SQL_BIN} AS bin,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 1, 2
    """,
)
def q_time_bin_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bin", time_bin(F.col("ts")))
        .groupBy("user_id", "bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents(F.col("value"))).alias("value_cents"))
    )


# ---------------------------------------------------------------------------
# P8: sanitize scalar
# ---------------------------------------------------------------------------


@register(
    "sanitize_ids",
    """
    SELECT DISTINCT
      -- mirrors sanitize_id's default: a NULL or all-illegal input maps to
      -- 'unknown' (PathFormatter sanitize semantics), never NULL/''
      CASE WHEN coalesce(
             regexp_replace('u ' || CAST(user_id AS VARCHAR) || '/'
                            || event_type,
                            '[^a-zA-Z0-9_-]+', '', 'g'), '') = ''
           THEN 'unknown'
           ELSE regexp_replace('u ' || CAST(user_id AS VARCHAR) || '/'
                               || event_type,
                               '[^a-zA-Z0-9_-]+', '', 'g')
      END AS sanitized
    FROM events
    """,
)
def q_sanitize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dirty = F.concat(F.lit("u "), ev.user_id.cast("string"), F.lit("/"), ev.event_type)
    return ev.select(sanitize_id(dirty, "unknown").alias("sanitized")).distinct()


# ---------------------------------------------------------------------------
# P1/P3: flatten projection + excludeFields
# ---------------------------------------------------------------------------


@register(
    "flatten_projection",
    f"""
    SELECT event_id,
           {_SQL_PROJECT.replace("'unknown-project'", "NULL").replace("'proj'", "'proj '")}
             AS "key.projectId",
           'user.' || CAST(user_id AS VARCHAR) AS "key.userId",
           'src-' || CAST(user_id % 5 AS VARCHAR) AS "key.sourceId",
           round({_SQL_TIME_S}, 6) AS "value.time",
           event_type AS "value.eventType",
           value AS "value.value"
    FROM events
    """,
)
def q_flatten_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CsvAvroDataConverter.kt:20-91 dot-joined flatten, analytic mode."""
    df = events_topic(spark, sf_dir).drop("user_id", "ts")
    flat = flatten(df, excluded={"value.props"})
    return flat.select(
        "event_id",
        "`key.projectId`",
        "`key.userId`",
        "`key.sourceId`",
        F.round(F.col("`value.time`"), 6).alias("value.time"),
        "`value.eventType`",
        "`value.value`",
    )


@register(
    "exclude_fields",
    f"""
    SELECT event_id,
           'user.' || CAST(user_id AS VARCHAR) AS "key.userId",
           event_type AS "value.eventType"
    FROM events
    """,
)
def q_exclude_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 excludeFields: dotted-leaf removal inside the flattener."""
    df = events_topic(spark, sf_dir).drop("user_id", "ts")
    flat = flatten(
        df,
        excluded={
            "key.projectId",
            "key.sourceId",
            "value.time",
            "value.value",
            "value.props",
        },
    )
    return flat.select("event_id", "`key.userId`", "`value.eventType`")


# ---------------------------------------------------------------------------
# D1-D4: window dedup
# ---------------------------------------------------------------------------

_SQL_DEDUP = """
    SELECT user_id, event_type, event_id,
           CAST(round(value * 100, 0) AS BIGINT) AS value_cents
    FROM (
      SELECT *, row_number() OVER (
        -- NULL placement mirrors Spark (ASC -> NULLS FIRST, DESC ->
        -- NULLS LAST); DuckDB defaults are the opposite
        PARTITION BY user_id, event_type
        ORDER BY ts {dirn} {nulls}, event_id {dirn} {nulls}
      ) AS rn
      FROM events
    ) WHERE rn = 1
"""


@register(
    "dedup_keep_last", _SQL_DEDUP.format(dirn="DESC", nulls="NULLS LAST")
)
def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D2 keep-LAST semantics (CsvAvroConverterFactory.kt:30-86) with
    distinct key (user_id, event_type), order = (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    kept = dedup_keep_last(
        ev,
        F.struct("ts", "event_id"),
        distinct_fields=["user_id", "event_type"],
        restore_order=False,
    )
    return kept.select(
        "user_id", "event_type", "event_id", cents(F.col("value")).alias("value_cents")
    )


@register(
    "dedup_keep_first", _SQL_DEDUP.format(dirn="ASC", nulls="NULLS FIRST")
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 keep-FIRST semantics (RecordConverterFactory.kt:166-193)."""
    ev = load_table(spark, sf_dir, "events")
    kept = dedup_keep_first(
        ev,
        F.struct("ts", "event_id"),
        distinct_fields=["user_id", "event_type"],
        restore_order=False,
    )
    return kept.select(
        "user_id", "event_type", "event_id", cents(F.col("value")).alias("value_cents")
    )


# ---------------------------------------------------------------------------
# P4/J1: seen-offset anti-join pruning
# ---------------------------------------------------------------------------


@register(
    "offset_antijoin",
    """
    WITH ledger AS (
      SELECT p, 1000 + p * 500 AS committed_to
      FROM (SELECT unnest(range(4)) AS p)
    )
    SELECT e.user_id % 4 AS p, count(*) AS n_new,
           min(e.event_id) AS min_id, max(e.event_id) AS max_id
    FROM events e
    LEFT JOIN ledger l ON e.user_id % 4 = l.p
    WHERE e.event_id > l.committed_to
    GROUP BY 1
    """,
)
def q_offset_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: candidate records anti-joined against committed offset ledger
    (accounting/OffsetIntervals.kt:23-44 at file granularity). The ledger is
    a broadcast dimension; survivors aggregate per partition."""
    ev = load_table(spark, sf_dir, "events")
    ledger = spark.range(4).select(
        F.col("id").cast("long").alias("p"), (1000 + F.col("id") * 500).alias("committed_to")
    )
    return (
        ev.withColumn("p", ev.user_id % 4)
        .join(F.broadcast(ledger), "p")
        .filter(F.col("event_id") > F.col("committed_to"))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


# ---------------------------------------------------------------------------
# G5/J4: dimension enrichment via broadcast join (the `mp` plugin)
# ---------------------------------------------------------------------------


@register(
    "mp_enrichment",
    """
    SELECT c.c_mktsegment AS segment, e.event_type,
           count(*) AS n,
           CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events e JOIN customer c ON c.c_custkey = e.user_id + 1
    GROUP BY 1, 2
    """,
)
def q_mp_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPPathFormatterPlugin.kt:30-157 as a broadcast hash join against the
    subject/project dimension (customer stands in for ManagementPortal)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), cust.c_custkey == ev.user_id + 1)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents(F.col("value"))).alias("value_cents"))
    )


# ---------------------------------------------------------------------------
# A1/S7: per-file record accounting
# ---------------------------------------------------------------------------


@register(
    "file_accounting",
    """
    SELECT event_id // 500 AS file_id,
           count(*) AS n_records,
           min(event_id) AS offset_from,
           max(event_id) AS offset_to,
           (count(*) = max(event_id) - min(event_id) + 1) AS complete
    FROM events GROUP BY 1
    """,
)
def q_file_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 expected-vs-actual record counts per source file
    (worker/RestructureWorker.kt:74-99); files simulated as id DIV 500."""
    ev = load_table(spark, sf_dir, "events")
    return (
        # integer DIV: truncating integer division on both engines (Spark
        # DIV == DuckDB //, verified incl. negatives), with no double
        # round-trip to lose exactness for ids beyond 2^53
        ev.groupBy(F.expr("event_id DIV 500").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("event_id").alias("offset_from"),
            F.max("event_id").alias("offset_to"),
        )
        .withColumn(
            "complete",
            F.col("n_records") == F.col("offset_to") - F.col("offset_from") + 1,
        )
    )


# ---------------------------------------------------------------------------
# J2/C2: extraction-verification anti-join (cleaner)
# ---------------------------------------------------------------------------


@register(
    "extraction_check",
    """
    SELECT s.user_id, count(*) AS n_missing
    FROM events s
    WHERE NOT EXISTS (
      SELECT 1 FROM events t
      WHERE t.event_id % 97 != 0 AND t.user_id = s.user_id AND t.ts = s.ts
    )
    GROUP BY 1
    """,
)
def q_extraction_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimestampExtractionCheck.kt:23-106: every source record's event time
    must exist in the extracted target; missing rows block source deletion.
    Target simulated as events minus every 97th record."""
    ev = load_table(spark, sf_dir, "events")
    target = ev.filter(ev.event_id % 97 != 0).select("user_id", "ts")
    return (
        ev.select("user_id", "ts")
        .join(target, ["user_id", "ts"], "left_anti")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_missing"))
    )


# ---------------------------------------------------------------------------
# C1: cleaner candidate selection
# ---------------------------------------------------------------------------


@register(
    "cleaner_candidates",
    """
    SELECT event_id // 500 AS file_id, count(*) AS n_records, max(ts) AS max_ts
    FROM events
    GROUP BY 1
    HAVING max(ts) < TIMESTAMP '2024-01-20 00:00:00'
       AND count(*) = max(event_id) - min(event_id) + 1
    """,
)
def q_cleaner_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SourceDataCleaner.kt:99-113: deletable = old enough AND fully
    accounted; age cutoff stands in for the 7-day rule."""
    ev = load_table(spark, sf_dir, "events")
    return (
        # integer DIV: truncating integer division on both engines (Spark
        # DIV == DuckDB //, verified incl. negatives), with no double
        # round-trip to lose exactness for ids beyond 2^53
        ev.groupBy(F.expr("event_id DIV 500").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.max("ts").alias("max_ts"),
            F.min("event_id").alias("_min"),
            F.max("event_id").alias("_max"),
        )
        .filter(
            (F.col("max_ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
            & (F.col("n_records") == F.col("_max") - F.col("_min") + 1)
        )
        .drop("_min", "_max")
    )


# ---------------------------------------------------------------------------
# O-class: window top-K
# ---------------------------------------------------------------------------


@register(
    "top_events_per_user",
    """
    SELECT user_id, event_id,
           CAST(round(value * 100, 0) AS BIGINT) AS value_cents, rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY value DESC, event_id ASC
      ) AS rn FROM events
    ) WHERE rn <= 3
    """,
)
def q_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", cents(F.col("value")).alias("value_cents"), "rn")
    )


# ---------------------------------------------------------------------------
# General SQL surface: TPC-H-style analytics (free with Spark SQL, SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "tpch_q1_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity), 0) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_disc_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0)
               AS BIGINT)) AS BIGINT) AS sum_charge_cents,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 0).cast("long").alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(disc)).alias("sum_disc_cents"),
            F.sum(cents(charge)).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_cents DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    """
    SELECT n.n_name AS nation,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .join(
            F.broadcast(t["supplier"]),
            (t["lineitem"].l_suppkey == t["supplier"].s_suppkey)
            & (t["customer"].c_nationkey == t["supplier"].s_nationkey),
        )
        .join(F.broadcast(t["nation"]), t["supplier"].s_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
    )


@register(
    "tpch_q6_forecast",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-heavy scan-aggregate (TPC-H Q6 shape): every predicate pushes
    into the parquet scan; the agg is a two-value partial -> single row."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS totalprice_cents,
           CAST(round(sum(l.l_quantity), 0) AS BIGINT) AS sum_qty
    FROM orders o
    JOIN big ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-order customers (TPC-H Q18 shape): semi-join against a
    partially-aggregated HAVING set, then dim joins — the big-side shuffle
    happens once on l_orderkey and AQE broadcasts the filtered order set."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("big_orderkey"))
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(li.alias("l2"), F.col("l2.l_orderkey") == orders.o_orderkey)
        .groupBy(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            cents(F.col("o_totalprice")).alias("totalprice_cents"),
        )
        .agg(F.round(F.sum("l2.l_quantity"), 0).cast("long").alias("sum_qty"))
    )


@register(
    "asof_last_purchase",
    """
    WITH r AS (
      -- right side deduped on (user_id, ts): ASOF JOIN's pick among
      -- duplicate right timestamps is unspecified, Spark's asof_join
      -- tie-break is deterministic — max(value) per instant makes both
      -- engines agree by construction
      SELECT user_id, ts, max(value) AS value FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL
            AND user_id IS NOT NULL
      GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, l.ts, l.event_type, l.value,
           r.ts AS asof_ts, r.value AS asof_value
    FROM events l
    ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    WHERE l.ts IS NOT NULL
    UNION ALL
    -- a NULL-ts left row has no "as of" moment: it survives unenriched
    -- (DuckDB's ASOF would otherwise match NULL against everything,
    -- where Spark's merge matches nothing)
    SELECT event_id, user_id, ts, event_type, value,
           NULL AS asof_ts, NULL AS asof_value
    FROM events WHERE ts IS NULL
    """,
)
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward-inclusive as-of join: every event enriched with the user's
    most recent purchase at that moment (point-in-time feature join). The
    operator is the union-merge plan — one shuffle on user_id, a per-key
    window carries the purchase payload forward; no range-join explosion
    (operators/asof.py)."""
    from radar_output_restructure_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts", "event_type", "value")
    right = (
        # NULL-ts purchases cannot anchor an as-of match, and a NULL-user
        # right row must not enrich NULL-user left rows: Spark's window
        # partitioning groups NULL keys together where SQL's equi-ASOF
        # never matches NULL = NULL (both mirrored in the oracle's r CTE)
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(left, right, on="user_id")


@register(
    "asof_next_purchase",
    """
    WITH r AS (
      -- right side deduped on (user_id, ts): ASOF JOIN's pick among
      -- duplicate right timestamps is unspecified, Spark's asof_join
      -- tie-break is deterministic — max(value) per instant makes both
      -- engines agree by construction
      SELECT user_id, ts, max(value) AS value FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL
            AND user_id IS NOT NULL
      GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, l.ts, l.event_type, l.value,
           r.ts AS asof_ts, r.value AS asof_value
    FROM events l
    ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    WHERE l.ts IS NOT NULL
    UNION ALL
    -- a NULL-ts left row has no "as of" moment: it survives unenriched
    -- (DuckDB's ASOF would otherwise match NULL against everything,
    -- where Spark's merge matches nothing)
    SELECT event_id, user_id, ts, event_type, value,
           NULL AS asof_ts, NULL AS asof_value
    FROM events WHERE ts IS NULL
    """,
)
def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-inclusive as-of join: every event enriched with the user's
    NEXT purchase at-or-after that moment (time-to-conversion features).
    Same union-merge plan as the backward join, window walked in
    descending timestamp order (operators/asof.py direction='forward')."""
    from radar_output_restructure_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts", "event_type", "value")
    right = (
        # NULL-ts purchases cannot anchor an as-of match, and a NULL-user
        # right row must not enrich NULL-user left rows: Spark's window
        # partitioning groups NULL keys together where SQL's equi-ASOF
        # never matches NULL = NULL (both mirrored in the oracle's r CTE)
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(left, right, on="user_id", direction="forward")


@register(
    "rolling_1h_user_stats",
    """
    SELECT event_id, user_id, ts,
           count(*) OVER w AS n_3600s,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
             AS cents_3600s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_1h_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the user's activity over the preceding hour (inclusive
    RANGE frame) — one shuffle + per-key sort, no self-join
    (operators/timeseries.py)."""
    from radar_output_restructure_spark.operators.timeseries import (
        rolling_window_stats,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return rolling_window_stats(ev, keys="user_id").drop("value")


@register(
    "event_props_json",
    """
    WITH p AS (
      -- json_valid guard: Spark's get_json_object returns NULL for
      -- malformed JSON, DuckDB's json_extract raises
      SELECT event_type,
             CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           round(sum(k) * 1.0 / count(k), 6) AS avg_k
    FROM p GROUP BY event_type
    """,
)
def q_event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull `$.k` out of the JSON `props`
    column (JVM-side get_json_object — no Python, no schema inference
    pass) and aggregate per event type. The average is an exact
    integer-sum / integer-count single division, so engines agree
    bit-for-bit; at scale this is one map-side-combined shuffle on
    event_type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.sum("k") * F.lit(1.0) / F.count("k"), 6).alias("avg_k"),
        )
    )


@register(
    "tpch_q4_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority check (TPC-H Q4 shape): EXISTS decorrelates to a
    LEFT SEMI join on the order key with the lateness predicate evaluated
    join-side — one shuffle on l_orderkey, then a map-side-combined count
    per priority. No subquery re-execution per row at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        F.col("l.l_orderkey") == F.col("o.o_orderkey")
    ) & (
        F.col("l.l_shipdate")
        > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.alias("o")
        .join(li.alias("l"), late, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


@register(
    "tpch_q16_supplier_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per part group (TPC-H Q16 shape): NOT IN
    decorrelates to a LEFT ANTI join against the excluded-supplier set,
    the part filter prunes before the fact join, and count(DISTINCT) runs
    as the standard two-phase distinct aggregation. No broadcast hints:
    part/supplier are SF-scaling dimensions, so AQE picks broadcast while
    they fit and degrades to shuffle joins when they don't (the vocab-join
    lesson from SCALE.md)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 5, 9, 13)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "leftanti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.count_distinct(F.col("l_suppkey"))
            .cast("bigint")
            .alias("supplier_cnt")
        )
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): which customers returned
    the most revenue in a quarter. Both date filters and the returnflag
    filter push into the scans; nation broadcasts (25 rows always);
    customer/orders join shuffles on the key; the final top-20 is a
    TakeOrdered, no global sort materialization."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q13_custdist",
    """
    SELECT c_orders, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_orders
    """,
)
def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER join
    keeps zero-order customers (count(o_orderkey) ignores the null-extended
    rows), then a second aggregation folds customers into a distribution.
    The priority predicate lives in the JOIN CONDITION, not a WHERE — a
    WHERE would silently turn the outer join inner. Two shuffles total
    (join+count on custkey, redistribute on c_orders), both map-side
    combined; the second frame is order-count-sized, i.e. tiny."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (F.col("o_custkey") == F.col("c_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_orders"))
        .groupBy("c_orders")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


@register(
    "tpch_q14_promo_share",
    """
    SELECT CAST(round(
             (100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                 ELSE 0 END) * 1000000)
             / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)),
             0) AS BIGINT) AS promo_micro_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): conditional aggregation
    over one fact⋈dim join — promo and total revenue accumulate in the SAME
    pass (no second scan, no self-join). Revenue sums are exact bigint
    cents; the single percent division happens once on two exact integers,
    so both engines produce the identical double, rounded to micro-percent.
    The part join carries no hint: AQE broadcasts the dimension while it
    fits (the SCALE.md vocab-join rule)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                (F.lit(100.0) * F.sum(promo) * 1_000_000) / F.sum(rev), 0
            )
            .cast("long")
            .alias("promo_micro_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
               AS total_revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): the revenue view aggregates the
    quarter once, a 1-row global max reduces from that supplier-sized frame
    (never a second fact scan), and the equality filter joins back via a
    broadcast of the scalar. localCheckpoint materializes the view so the
    two consumers (max + join) share one computation. Revenue is exact
    bigint cents, so the max-equality is deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("total_revenue_cents")
        )
        .localCheckpoint(eager=False)
    )
    best = revenue.agg(F.max("total_revenue_cents").alias("best_cents"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue_cents") == F.col("best_cents"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


@register(
    "tpch_q22_idle_customers",
    """
    SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c
    WHERE CAST(round(c.c_acctbal * 100, 0) AS BIGINT) > (
        SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) * 1.0 / count(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def q_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle wealthy customers (TPC-H Q22 shape): a scalar AVG subquery
    (computed as exact-cents sum/count so both engines see one identical
    double division) broadcast-filters customers, and NOT EXISTS against
    recent orders decorrelates to a LEFT ANTI join. The anti-join's right
    side prunes to the date window BEFORE shuffling; at 100 TB that is the
    difference between shuffling a week of orders and all of them."""
    cust = load_table(spark, sf_dir, "customer")
    threshold = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(cents(F.col("c_acctbal"))) * 1.0 / F.count(F.lit(1))).alias(
                "avg_cents"
            )
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(cents(F.col("c_acctbal")) > F.col("avg_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(cents(F.col("c_acctbal"))).alias("totacctbal_cents"),
        )
    )


@register(
    "event_attribution_windows",
    """
    WITH a AS (
      SELECT event_id AS anchor_id, user_id, ts AS t0,
             ts + INTERVAL 4 HOUR AS t1
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.anchor_id,
           CAST(count(e.event_id) AS BIGINT) AS n_follow,
           CAST(coalesce(sum(CAST(round(e.value * 100, 0) AS BIGINT)), 0)
                AS BIGINT) AS follow_cents
    FROM a LEFT JOIN events e
      ON e.user_id = a.user_id
     AND e.event_id != a.anchor_id
     AND e.ts >= a.t0 AND e.ts < a.t1
    GROUP BY 1
    """,
)
def q_event_attribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution windows (the canonical non-equi range join): per purchase
    event, count + cents-sum of the same user's events in the following 4
    hours. Runs through operators/timeseries.interval_join — bucketized on
    the window length so the join is an equi-join on (user, time bucket)
    with a residual BETWEEN, never a per-user cartesian (the naive range
    join goes quadratic on hot users at 100 TB). Zero-follow anchors are
    restored by a left join against the anchor set, matching the SQL LEFT
    JOIN exactly."""
    from radar_output_restructure_spark.operators.timeseries import (
        interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("t1"),
    )
    follows = interval_join(
        ev.select("user_id", "event_id", "ts", "value"),
        anchors,
        keys="user_id",
        left_ts="ts",
        start_col="t0",
        end_col="t1",
        bucket_s=4 * 3600,
    ).filter(F.col("event_id") != F.col("anchor_id"))
    agg = follows.groupBy("anchor_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_follow"),
        F.sum(cents(F.col("value"))).alias("follow_cents"),
    )
    return (
        anchors.select("anchor_id")
        .join(agg, "anchor_id", "left")
        .select(
            "anchor_id",
            F.coalesce(F.col("n_follow"), F.lit(0)).cast("bigint").alias("n_follow"),
            F.coalesce(F.col("follow_cents"), F.lit(0))
            .cast("bigint")
            .alias("follow_cents"),
        )
    )


@register(
    "tpch_q7_nation_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between a nation pair by year (TPC-H Q7 shape): the
    disjunctive cross-nation predicate is applied AFTER both nation
    broadcasts (25 rows each — always broadcast), the shipdate window
    pushes into the fact scan, and year() stays a codegen'd expression.
    Fact⋈orders⋈customer shuffle on their keys; dims ride broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate")).cast("int").alias("l_year"),
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents")
        )
    )


@register(
    "tpch_q17_small_quantity",
    """
    WITH pq AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sq,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)), 0)
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN pq ON l.l_partkey = pq.pk
    WHERE 2 * CAST(round(l.l_quantity, 0) AS BIGINT) * pq.cnt < pq.sq
    """,
)
def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity order revenue (TPC-H Q17 shape): the correlated
    per-part AVG subquery decorrelates to one per-part aggregate joined
    back to the fact table on the part key — the fact is scanned twice but
    never per-row re-aggregated. The average comparison is EXACT: with
    integral quantities, `qty < 0.5 * avg` rewrites to
    `2*qty*count < sum` over bigints, so no float average can diverge at a
    boundary row in either engine."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).cast("long").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    return (
        li.join(pq, F.col("l_partkey") == F.col("pk"))
        .filter(F.lit(2) * qty * F.col("cnt") < F.col("sq"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.coalesce(F.sum(cents(F.col("l_extendedprice"))), F.lit(0))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(coalesce(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                                   AS BIGINT)), 0) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
    """,
)
def q_tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under disjunctive multi-table predicates (TPC-H
    Q19 shape). The OR spans both tables, so no single conjunct pushes to
    either scan wholesale — but Catalyst derives the per-table IMPLIED
    disjunctions (brand IN (..) OR.. on part, quantity range union on
    lineitem) and pushes those, so each scan still prunes before the join.
    The residual OR evaluates post-join in codegen. part is a dimension:
    no hint, AQE broadcasts while it fits."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#9")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond1 | cond2)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.coalesce(
                F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


@register(
    "tpch_q8_market_share",
    """
    WITH rev AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             n1.n_name AS supp_nation,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
               AS rev_cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer cu ON cu.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = cu.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_cents ELSE 0 END)
                AS BIGINT) AS nation_cents,
           CAST(sum(rev_cents) AS BIGINT) AS total_cents,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_cents ELSE 0 END)
                      * 1000000.0 / sum(rev_cents), 0) AS BIGINT) AS share_micro
    FROM rev GROUP BY o_year
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): a ratio of two aggregates
    per group computed in ONE pass with conditional aggregation — no
    self-join of the revenue frame. Region/nation dims broadcast; the
    share division happens once per year group on two exact bigint sums."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    ))
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    nation_rev = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0))
    grouped = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(reg), F.col("n2_region") == F.col("r_regionkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year(F.col("o_orderdate")).cast("int").alias("o_year"))
        .agg(
            F.sum(nation_rev).cast("bigint").alias("nation_cents"),
            F.sum(rev).cast("bigint").alias("total_cents"),
        )
    )
    return grouped.select(
        "o_year",
        "nation_cents",
        "total_cents",
        F.round(F.col("nation_cents") * 1_000_000.0 / F.col("total_cents"), 0)
        .cast("long")
        .alias("share_micro"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT DISTINCT l.l_partkey AS pk, s.s_suppkey, s.s_name, s.s_acctbal
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    ),
    ranked AS (
      SELECT pk, s_suppkey, s_name,
             CAST(round(s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
             row_number() OVER (
               PARTITION BY pk
               ORDER BY CAST(round(s_acctbal * 100, 0) AS BIGINT) ASC,
                        s_suppkey ASC
             ) AS rn
      FROM ps
    )
    SELECT pk AS p_partkey, s_suppkey, s_name, acctbal_cents
    FROM ranked WHERE rn = 1 AND pk < 200
    """,
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (TPC-H Q2 shape, adapted to the schema's
    supply relation = observed lineitem shipments): the correlated MIN
    subquery decorrelates to a per-part window argmin with deterministic
    ties (acctbal asc, suppkey asc). The distinct part-supplier relation
    reduces the fact table before the window, so the window input is
    relation-sized, not shipment-sized."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    sup = load_table(spark, sf_dir, "supplier")
    ps = (
        li.select(F.col("l_partkey").alias("pk"), "l_suppkey")
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("pk", "s_suppkey", "s_name", cents(F.col("s_acctbal")).alias("acctbal_cents"))
        .distinct()
    )
    w = Window.partitionBy("pk").orderBy(
        F.col("acctbal_cents").asc(), F.col("s_suppkey").asc()
    )
    return (
        ps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("pk").alias("p_partkey"), "s_suppkey", "s_name", "acctbal_cents")
    )


@register(
    "tpch_q9_profit_by_nation",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%a%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit rollup by supplier nation and order year (TPC-H
    Q9 shape; the testdata schema has no partsupp, so profit omits the
    supplycost term — the plan shape is what matters). Four-way fact⋈dims
    star: the part-name LIKE filter pushes into the part scan BEFORE its
    join (Catalyst pushdown), nation/part/supplier ride AQE broadcasts,
    lineitem⋈orders shuffles on the order key once. year() and the money
    arithmetic stay codegen'd; cents keep both engines bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate")).cast("int").alias("o_year"),
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("profit_cents")
        )
    )


@register(
    "tpch_q11_important_parts",
    """
    WITH pv AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                           AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM pv)
    SELECT l_partkey, value_cents
    FROM pv, total
    WHERE value_cents * 1000 > total_cents
    """,
)
def q_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose traded value exceeds 0.1% of the corpus total (TPC-H
    Q11's global-threshold HAVING shape, over lineitem value since the
    schema has no partsupp). ONE aggregation builds the per-part frame; the
    scalar total reduces FROM that frame (part-cardinality input, not a
    second fact scan) and folds back as a broadcast 1-row cross join. The
    threshold compares integer cents (value*1000 > total), so no float
    fraction can flip a boundary part in either engine."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("value_cents")
    )
    total = pv.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


@register(
    "tpch_q12_priority_lines",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional priority counts per line status (TPC-H Q12 shape; the
    schema has no shipmode, l_linestatus plays its role). The year window
    pushes into the lineitem scan; the CASE counts are map-side-combinable
    sums so the single shuffle carries two longs per group, and the
    orders join shuffles only the filtered fact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q20_part_promotion",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    part_total AS (
      SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
      FROM shipped GROUP BY 1
    ),
    big AS (
      SELECT DISTINCT s.l_suppkey
      FROM shipped s
      JOIN part_total t ON t.l_partkey = s.l_partkey
      JOIN part p ON p.p_partkey = s.l_partkey AND p.p_name LIKE 'small%'
      WHERE 2 * s.qty > t.total_qty
    )
    SELECT sup.s_suppkey, sup.s_name
    FROM supplier sup JOIN big ON big.l_suppkey = sup.s_suppkey
    """,
)
def q_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers dominating a filtered part's shipments (TPC-H Q20's nested
    semi-join-with-correlated-threshold shape; availqty comes from shipped
    quantity since the schema has no partsupp). The correlated `> half of
    the part's total` decorrelates into one (supp, part) aggregate reused
    TWICE — its own re-aggregation produces the per-part totals, so the
    fact is scanned once. The name-filtered part dim broadcasts; the final
    supplier semi-join is a distinct-then-join on the tiny winner set.
    Threshold is integer (2*qty > total): engine-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    sup = load_table(spark, sf_dir, "supplier")
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).cast("long").alias("qty")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").cast("long").alias("total_qty")
    )
    big = (
        shipped.join(part_total, F.col("l_partkey") == F.col("pk"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.lit(2) * F.col("qty") > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return sup.join(big, F.col("s_suppkey") == F.col("l_suppkey")).select(
        "s_suppkey", "s_name"
    )


@register(
    "tpch_q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    ),
    multi AS (
      SELECT a.l_orderkey, a.l_suppkey
      FROM late a
      WHERE EXISTS (SELECT 1 FROM lineitem b
                    WHERE b.l_orderkey = a.l_orderkey
                      AND b.l_suppkey <> a.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late c
                        WHERE c.l_orderkey = a.l_orderkey
                          AND c.l_suppkey <> a.l_suppkey)
    )
    SELECT s.s_name,
           CAST(count(DISTINCT m.l_orderkey) AS BIGINT) AS numwait
    FROM multi m JOIN supplier s ON s.s_suppkey = m.l_suppkey
    GROUP BY 1
    """,
)
def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who alone held up multi-supplier orders (TPC-H Q21's
    EXISTS / NOT-EXISTS double self-join shape; 'late' is shipdate >
    orderdate + 30 days since the schema has no commit/receipt dates).
    Both correlated subqueries become LEFT SEMI / LEFT ANTI self-joins on
    the order key — the Spark-native decorrelation — and both join against
    the ALREADY-REDUCED late frame or the (orderkey, suppkey)-projected
    fact, never the full-width fact twice. numwait counts distinct orders
    (dedup against multi-line shipments), map-side partially aggregated."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    lines = li.select(
        F.col("l_orderkey").alias("b_ok"), F.col("l_suppkey").alias("b_sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("c_ok"), F.col("l_suppkey").alias("c_sk")
    )
    multi = (
        late.join(
            lines,
            (F.col("l_orderkey") == F.col("b_ok"))
            & (F.col("l_suppkey") != F.col("b_sk")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("c_ok"))
            & (F.col("l_suppkey") != F.col("c_sk")),
            "left_anti",
        )
    )
    return (
        multi.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct(F.col("l_orderkey")).cast("bigint").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# bucketed (co-located) fact-fact join — the shuffle-elimination showcase
# ---------------------------------------------------------------------------


@register(
    "bucketed_join_sales",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS sum_price_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_bucketed_join_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem x orders fact-fact join executed over BUCKETED
    materializations: both tables are written once per (session, dataset)
    as 16-bucket tables on their order key (operators/bucketing), so the
    join itself plans with NO Exchange on either side — the write-time
    shuffle is paid once and every subsequent join on the key rides it.
    At 100 TB this is the difference between re-shuffling two fact tables
    per query and a local sort-merge; the plan property is asserted in
    tests/test_bucketing.py. Results are identical to the plain join (the
    oracle), because bucketing changes layout, not content."""
    import os as _os
    import shutil as _shutil

    from radar_output_restructure_spark.operators.bucketing import (
        write_bucketed,
    )
    from radar_output_restructure_spark.sources.tables import (
        dataset_fingerprint,
    )

    tag = dataset_fingerprint(sf_dir, ("orders", "lineitem"))
    t_orders, t_li = f"b7_orders_{tag}", f"b7_lineitem_{tag}"

    def _ensure(table: str, src: str, cols: list[str], key: str) -> None:
        if spark.catalog.tableExists(table):
            return
        # catalog metadata is session-scoped but the warehouse directory
        # persists: clear a stale location left by an earlier session
        # before re-materializing (the fingerprint tag guarantees it was
        # built from the SAME data, but the catalog no longer knows it)
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        loc = _os.path.join(wh, table.lower())
        if _os.path.exists(loc):
            _shutil.rmtree(loc)
        write_bucketed(
            load_table(spark, sf_dir, src).select(*cols),
            table,
            key,
            num_buckets=16,
        )

    _ensure(t_orders, "orders", ["o_orderkey", "o_orderpriority"], "o_orderkey")
    _ensure(
        t_li, "lineitem", ["l_orderkey", "l_extendedprice"], "l_orderkey"
    )
    li = spark.table(t_li)
    orders = spark.table(t_orders)
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
    )
