"""Distributed merge-asof join.

For each left row, attach the latest right row whose timestamp is <= the
left timestamp (backward direction, inclusive), per join key — the
time-series enrichment primitive (sensor calibration lookup, latest-state
join, point-in-time features for training data).

Spark has no ASOF JOIN operator; the naive formulations both fail at scale:

* inequality join + row_number: a range join explodes to O(|L| x |R|) per
  key before the filter;
* per-key collect + python merge: not distributed.

The scalable plan is the classic union-merge: UNION both sides with a side
marker, ONE hash shuffle on the key, then a per-key window ordered by
(ts, side) carries the right side's payload forward with
last_value(ignoreNulls). Cost is a single shuffle + per-key sort —
O(n log n) in the partition, zero join blow-up, AQE-skew-splittable like any
window. Right rows sort BEFORE left rows on timestamp ties, so an exactly
simultaneous right row matches (inclusive semantics, same as DuckDB/pandas
`ASOF JOIN` / `merge_asof`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt: T.DataType) -> bool:
    """True when the type holds a MapType anywhere — maps are not orderable
    in Spark, so they cannot serve as window-order tiebreaks."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: float | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join, backward (default) or forward.

    backward: latest right row with rts <= lts (point-in-time features).
    forward:  earliest right row with rts >= lts (next-event lookups —
    pandas merge_asof(direction="forward") / DuckDB `ASOF ... ON l.ts <=
    r.ts`). The forward plan is the same union-merge with the per-key
    window walked in DESCENDING timestamp order, so the carried right row
    is always the smallest rts >= lts — still one shuffle, no range join.

    Every column of `right` except the keys/timestamp joins the output as
    `<prefix><name>`; the matched right timestamp is `<prefix>ts`. Rows
    with no matching right row (or none within `tolerance_s`) get nulls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in set(on) and c != right_ts]

    r = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts first on ts ties (inclusive)
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    # Tie determinism, resolved BEFORE the union: several right rows
    # sharing (key, ts) collapse to the one with the greatest ORDERABLE
    # payload tuple (max_by keeps the row atomic, so non-orderable map
    # columns ride along with their winner). Appending the payload columns
    # to the window ORDER BY gave the same winner but widened the
    # union-merge sort key by the whole payload — the measured ~x1.4 cost
    # of the r10 struct-carry correctness fix; this map-side-combined
    # pre-aggregation restores the narrow (ts, side) sort. Rows that tie
    # on every orderable column differ only in maps: arbitrary winner,
    # same (accepted) nondeterminism as the sort-tiebreak had.
    if payload:
        orderable = [
            F.col(f"__p_{c}")
            for c in payload
            if not _contains_map(r.schema[f"__p_{c}"].dataType)
        ]
        row = F.struct(
            F.col("__rts"), *[F.col(f"__p_{c}") for c in payload]
        )
        winner = (
            F.max_by(row, F.struct(*orderable)) if orderable else F.max(row)
        )
        r = (
            r.groupBy(*on, "__ts")
            .agg(winner.alias("__win"))
            .select(
                *on,
                "__ts",
                F.lit(0).alias("__side"),
                F.col("__win.__rts").alias("__rts"),
                *[
                    F.col(f"__win.__p_{c}").alias(f"__p_{c}")
                    for c in payload
                ],
            )
        )
    l_marked = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rts"].dataType).alias("__rts"),
        *[
            F.lit(None).cast(r.schema[f"__p_{c}"].dataType).alias(f"__p_{c}")
            for c in payload
        ],
    )
    # right rows gain left's other columns as nulls; they are filtered back
    # out after the window pass
    unioned = l_marked.unionByName(r, allowMissingColumns=True)
    # (ts, side) is a total order over the rows that matter: right rows
    # are unique per (key, ts) after the pre-union tie resolution above,
    # and left rows tying with each other carry identical matches anyway.
    ts_order = (
        F.col("__ts").desc() if direction == "forward" else F.col("__ts").asc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The right row is carried as ONE struct, not per-column last(...,
    # ignorenulls) calls: independent per-column carries SKIP a right row
    # for exactly the columns it holds NULL in, stitching the matched ts
    # from one row to payload values from an OLDER row — a row that never
    # existed. The struct is non-null for every right row (even all-NULL
    # payloads), so the carry is atomic. Right rows with a NULL timestamp
    # are excluded up front: they cannot anchor an as-of match.
    row_struct = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__rts").alias("ts"),
            *[F.col(f"__p_{c}").alias(c) for c in payload],
        ),
    )
    carried = unioned.select(
        "*", F.last(row_struct, ignorenulls=True).over(w).alias("__m")
    )
    out = carried.filter(F.col("__side") == 1)
    # a NULL-ts LEFT row has no "as of" moment either: in the forward
    # (desc) walk it sorts after every right row and would otherwise
    # match the earliest one
    matched: Column = (
        F.col("__m").isNotNull()
        & F.col("__m.ts").isNotNull()
        & F.col("__ts").isNotNull()
    )
    if tolerance_s is not None:
        gap = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.ts"))
        if direction == "forward":
            gap = -gap
        matched = matched & (gap <= int(tolerance_s * 1_000_000))
    result_cols = [F.col(c) for c in left.columns]
    result_cols.append(
        F.when(matched, F.col("__m.ts")).alias(f"{prefix}{right_ts}")
    )
    result_cols += [
        F.when(matched, F.col(f"__m.{c}")).alias(f"{prefix}{c}")
        for c in payload
    ]
    return out.select(*result_cols)
