"""Path-segment sanitization (reference path/RecordPathFactory.kt:119-125).

The reference strips every character outside `[a-zA-Z0-9_-]` and substitutes a
default ("unknown-project" / "unknown-user" / ...) when the result is empty or
the input was null (path/FixedPathFormatterPlugin.kt:22-24). Expressed as a
pure Column — regexp_replace + when — so it stays inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ILLEGAL_RE = "[^a-zA-Z0-9_-]+"

UNKNOWN_PROJECT = "unknown-project"
UNKNOWN_USER = "unknown-user"
UNKNOWN_SOURCE = "unknown-source"
UNKNOWN_TIME = "unknown-time"


def sanitize_id(col: Column | str, default: str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(col.cast("string"), ILLEGAL_RE, "")
    return F.when(cleaned.isNull() | (cleaned == ""), F.lit(default)).otherwise(cleaned)


def sanitize_str(value: str | None, default: str) -> str:
    """Driver-side Python model of `sanitize_id` — same semantics, used for
    property tests and anywhere path segments are built outside a plan."""
    import re

    cleaned = re.sub(ILLEGAL_RE, "", value) if value is not None else ""
    return cleaned if cleaned else default
