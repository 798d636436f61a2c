"""Subset-schema compatibility (reference CsvAvroConverter.kt:76-85,
CsvAvroConverterTest.kt subSchema/differentOrder).

The reference appends a record to an existing CSV file when the record's
flattened headers are an ORDER-PRESERVING SUBSET of the file's header
(missing trailing/interior fields render as empty cells); a record with the
same names in a different order, or with new names, forces the
attempt-suffixed `<timebin>_N` file. At this repo's file-schema granularity
the same rule applies between source-file schemas and the per-attempt
superset schema:

* `is_subschema(sub, sup)` — every field of `sub` appears in `sup` with the
  same name and leaf type, in `sup`'s relative order; struct fields recurse
  (a nested value-struct missing trailing fields is still the same file).
* `conform_to(df, sup, keep)` — project `df` onto the superset schema,
  null-filling the missing (sub)fields, so subset groups union with their
  superset group into one write.

Both are pure plan construction — typed null literals and struct rebuilds,
no data movement beyond the projection itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def is_subschema(sub: T.DataType, sup: T.DataType) -> bool:
    """True when `sub` records can be written into a file laid out for
    `sup`: order-preserving field subsequence with equal leaf types."""
    if isinstance(sub, T.StructType) and isinstance(sup, T.StructType):
        i = 0
        sup_fields = sup.fields
        for f in sub.fields:
            while i < len(sup_fields) and sup_fields[i].name != f.name:
                i += 1
            if i == len(sup_fields):
                return False  # name missing or out of order
            if not is_subschema(f.dataType, sup_fields[i].dataType):
                return False
            i += 1
        return True
    return sub == sup  # leaves (incl. arrays/maps) must match exactly


def _conform_expr(
    expr: Column | None, actual: T.DataType | None, target: T.DataType
) -> Column:
    if expr is None or actual is None:
        return F.lit(None).cast(target)
    if isinstance(target, T.StructType):
        actual_fields = (
            {f.name: f.dataType for f in actual.fields}
            if isinstance(actual, T.StructType)
            else {}
        )
        children = []
        for f in target.fields:
            sub_t = actual_fields.get(f.name)
            child = _conform_expr(
                expr.getField(f.name) if sub_t is not None else None,
                sub_t,
                f.dataType,
            )
            children.append(child.alias(f.name))
        return F.struct(*children)
    return expr


def conform_to(
    df: DataFrame, sup: T.StructType, keep: list[str] = ()
) -> DataFrame:
    """Project `df`'s data columns onto the superset schema `sup` (missing
    fields become typed nulls); `keep` columns pass through unchanged."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = [
        _conform_expr(
            F.col(f"`{f.name}`") if f.name in have else None,
            have.get(f.name),
            f.dataType,
        ).alias(f.name)
        for f in sup.fields
    ]
    return df.select(*cols, *[F.col(f"`{c}`") for c in keep if c in have])
