"""Java-compatible CSV renderings for golden-file parity.

The reference renders CSV cells with Java `toString()` semantics
(format/CsvAvroDataConverter.kt:68-95):

* bytes / fixed  -> base64 WITHOUT padding (Base64.getEncoder().withoutPadding())
* double / float -> Java `Double.toString` / `Float.toString` — shortest
  round-trip decimal with scientific notation outside [1e-3, 1e7), e.g.
  `1.58021982003E9`, `1.21322421E-15`, `0.1213231`
* null           -> empty string

Spark's `base64` pads, so base64_no_pad strips it as a pure Column. Floats
and doubles need NO custom code on the write path: Spark's string cast IS
Java `Double.toString`/`Float.toString` (same JVM as the reference), so
flatten(rendered=True) gets exact parity for free — see
functions/flatten.py:39-44. The pandas_udf here (`java_double_repr`) exists
only as an executable cross-check used by tests to assert that equivalence.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def base64_no_pad(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.base64(col), "=+$", "")


def _java_double_str(x: float) -> str:
    """Replicate java.lang.Double.toString for finite doubles.

    Java: if 1e-3 <= |x| < 1e7 plain decimal, else scientific `d.dddEn`;
    always at least one digit after the decimal point; shortest digits that
    round-trip (repr(x) in Python is also shortest-round-trip, so we reuse its
    digits and re-layout)."""
    if x != x:
        return "NaN"
    if x == math.inf:
        return "Infinity"
    if x == -math.inf:
        return "-Infinity"
    if x == 0.0:
        return "-0.0" if math.copysign(1.0, x) < 0 else "0.0"
    sign = "-" if x < 0 else ""
    ax = abs(x)
    # repr gives shortest round-trip digits; normalize to digits + exponent
    mant, exp10 = _digits_exp(ax)
    if 1e-3 <= ax < 1e7:
        # plain notation
        point = exp10 + 1  # digits before the decimal point
        if point <= 0:
            body = "0." + "0" * (-point) + mant
        elif point >= len(mant):
            body = mant + "0" * (point - len(mant)) + ".0"
        else:
            body = mant[:point] + "." + mant[point:]
        return sign + body
    head = mant[0] + "." + (mant[1:] or "0")
    return f"{sign}{head}E{exp10}"


def _digits_exp(ax: float) -> tuple[str, int]:
    """Shortest round-trip significant digits of ax and its decimal exponent."""
    r = repr(ax)
    if "e" in r or "E" in r:
        m, _, e = r.partition("e" if "e" in r else "E")
        exp = int(e)
    else:
        m, exp = r, 0
    if "." in m:
        int_part, frac = m.split(".")
    else:
        int_part, frac = m, ""
    digits = (int_part + frac).lstrip("0")
    # exponent of the first significant digit
    if int_part.strip("0"):
        exp10 = exp + len(int_part) - 1
    else:
        lead_zeros = len(frac) - len(frac.lstrip("0"))
        exp10 = exp - lead_zeros - 1
    return digits.rstrip("0") or "0", exp10


def _java_float_str(x: float) -> str:
    """java.lang.Float.toString: shortest digits that round-trip at float32."""
    import struct as _struct

    if x != x:
        return "NaN"
    if x == math.inf:
        return "Infinity"
    if x == -math.inf:
        return "-Infinity"
    f32 = _struct.unpack("f", _struct.pack("f", x))[0]
    # find shortest decimal that round-trips through float32
    for prec in range(1, 10):
        cand = f"{f32:.{prec}g}"
        if _struct.unpack("f", _struct.pack("f", float(cand)))[0] == f32:
            break
    return _java_double_str(float(cand))


# pandas_udf parses its return-type DDL against the active session, so the
# UDFs are built lazily (first use) rather than at import time.
_UDF_CACHE: dict[str, object] = {}


def _lazy_udf(name: str, fn):
    udf = _UDF_CACHE.get(name)
    if udf is None:
        udf = pandas_udf(fn, "string")
        _UDF_CACHE[name] = udf
    return udf


def java_double_repr(col: Column | str) -> Column:
    fn = lambda s: s.map(  # noqa: E731
        lambda v: None if v is None or v != v else _java_double_str(float(v))
    )
    return _lazy_udf("java_double_repr", fn)(F.col(col) if isinstance(col, str) else col)


def java_float_repr(col: Column | str) -> Column:
    fn = lambda s: s.map(  # noqa: E731
        lambda v: None if v is None or v != v else _java_float_str(float(v))
    )
    return _lazy_udf("java_float_repr", fn)(F.col(col) if isinstance(col, str) else col)


def java_number_repr(col: Column | str, spark_type: str) -> Column:
    """Render a numeric column the way Java toString would (CSV parity)."""
    col = F.col(col) if isinstance(col, str) else col
    if spark_type in ("double",):
        return java_double_repr(col)
    if spark_type in ("float",):
        return java_float_repr(col.cast("double"))
    # int/long/boolean: Spark's string cast already matches Java
    return col.cast("string")
