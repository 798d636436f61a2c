"""Skew-mitigation operators: salted two-stage aggregation.

The hot-key problem at 100 TB: a groupBy key with a handful of giant
groups (event_type has ~5 values over billions of rows) sends each giant
group to ONE reducer. Plain sum/count survive via map-side partial
aggregation, but COUNT(DISTINCT x) does not — Spark plans it as an Expand
+ re-shuffle on (key, x) whose reduce side still concentrates per-key
state, and collect-style aggs concentrate payload outright. The classic
fix is salting: split every group into S sub-groups on a hash of the
DISTINCT column, aggregate the sub-groups in parallel, then combine the
S partial results per key.

Exactness invariant: the salt is derived from the distinct column itself,
so equal values always land in the same sub-group — each sub-group's
COUNT(DISTINCT) counts a DISJOINT value set and the stage-2 SUM of
partials is the exact distinct count (not an approximation). Associative
aggs (sum/count/min/max) re-combine with sum/sum/min/max respectively.

Stage-2 input is |keys| x S rows regardless of corpus size — kilobytes —
so the second shuffle is free; the win is stage 1's reduce parallelism
going from |keys| to |keys| x S.

Salt choice (r7 verdict item 7 folded the former bucketing.salted_agg
rand() variant in here as the `salt_col=None` default): a rand()-derived
salt spreads rows uniformly and is always safe for ASSOCIATIVE aggs
(sum/count/min/max) — partials recombine regardless of which sub-group a
row landed in. A COUNT(DISTINCT) leg additionally needs equal values in
the same sub-group (else the same value is counted in several partials),
so it requires a value-derived `salt_col` that is a pure function of the
distinct column; passing none raises instead of silently over-counting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (stage-1 partial agg, stage-2 combiner) per supported agg kind
_COMBINERS = {
    "sum": F.sum,
    "count": F.sum,
    "count_distinct": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, Column, str]],
    salt_col: Column | None = None,
    num_salts: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation.

    `aggs` is a list of (kind, column, alias) with kind one of
    sum / count / count_distinct / min / max. `salt_col` MUST be a pure
    function of the count_distinct column when one is present (the
    disjointness that makes the combined distinct count exact); for other
    aggs any value-spreading expression works, and `salt_col=None` salts
    with seeded rand() (the former bucketing.salted_agg behavior —
    associative aggs only).
    """
    for kind, _c, _a in aggs:
        if kind not in _COMBINERS:
            raise ValueError(f"unsupported agg kind: {kind}")
    distinct_exprs = {
        str(c) for kind, c, _a in aggs if kind == "count_distinct"
    }
    if len(distinct_exprs) > 1:
        # one salt expression can be a pure function of AT MOST ONE
        # distinct column; the other column's equal values scatter across
        # sub-groups and the summed partials silently over-count — the
        # same hazard the rand()-salt guard below rejects
        raise ValueError(
            "salted_agg supports count_distinct over a single column per "
            f"call (got {sorted(distinct_exprs)}); split into separate "
            "salted_agg calls, each salted by its own distinct column"
        )
    if salt_col is None:
        if any(kind == "count_distinct" for kind, _c, _a in aggs):
            raise ValueError(
                "count_distinct needs a value-derived salt_col: a rand() "
                "salt scatters equal values across sub-groups and the "
                "summed partials over-count (module docstring)"
            )
        salt = (F.rand(seed=42) * num_salts).cast("int").alias("__salt")
    else:
        salt = F.pmod(salt_col, F.lit(num_salts)).alias("__salt")
    partials = []
    for kind, col, alias in aggs:
        if kind == "sum":
            partials.append(F.sum(col).alias(alias))
        elif kind == "count":
            partials.append(F.count(col).alias(alias))
        elif kind == "count_distinct":
            partials.append(F.count_distinct(col).alias(alias))
        elif kind == "min":
            partials.append(F.min(col).alias(alias))
        elif kind == "max":
            partials.append(F.max(col).alias(alias))
    stage1 = df.groupBy(*keys, salt).agg(*partials)
    finals = [
        _COMBINERS[kind](F.col(alias)).alias(alias) for kind, _c, alias in aggs
    ]
    return stage1.groupBy(*keys).agg(*finals)
