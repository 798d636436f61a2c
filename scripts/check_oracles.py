#!/usr/bin/env python
"""Mirror of the driver's CORRECTNESS gate: run every __spark_entry__ query
and its DuckDB oracle at sf0.01, compare row count, schema (sorted column
names), and order-insensitive values (exact; floats compared bitwise after a
tolerant diagnostic pass).

Usage: python scripts/check_oracles.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        if df[c].dtype == bool:
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    ok = True
    if len(spark_df) != len(oracle_df):
        print(f"  ROWS MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}")
        ok = False
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        print(f"  SCHEMA MISMATCH spark={s_cols} oracle={o_cols}")
        return False
    if not ok:
        return False
    # Dtype-strict gate: the driver's hash is rendering-sensitive, so an int64
    # Spark column vs a float64 oracle column ("140" vs "140.0") fails there
    # even when values agree.  DuckDB types sum(BIGINT) as HUGEINT -> pandas
    # float64; oracles must CAST(sum(..) AS BIGINT).  Flag any int/float kind
    # divergence instead of silently coercing (the round-1 blind spot).
    for c in sorted(spark_df.columns):
        sk = spark_df[c].to_numpy().dtype.kind
        okind = oracle_df[c].to_numpy().dtype.kind
        num = {"i", "u", "f"}
        if sk in num and okind in num and (sk == "f") != (okind == "f"):
            print(
                f"  DTYPE MISMATCH col={c} spark={spark_df[c].dtype} "
                f"oracle={oracle_df[c].dtype} (driver hash would fail)"
            )
            ok = False
    if not ok:
        return False
    s, o = normalize(spark_df), normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv, ov = sv.astype(float), ov.astype(float)
            both_nan = np.isnan(sv) & np.isnan(ov)
            exact = (sv == ov) | both_nan
            if not exact.all():
                close = np.isclose(sv, ov, rtol=1e-9, atol=1e-9) | both_nan
                n_bad = int((~exact).sum())
                kind = "CLOSE-BUT-NOT-EXACT" if close.all() else "VALUE MISMATCH"
                print(f"  {kind} col={c} n={n_bad}")
                bad = np.where(~exact)[0][:3]
                for i in bad:
                    print(f"    row{i}: spark={sv[i]!r} oracle={ov[i]!r}")
                ok = False
        else:
            if not (sv == ov).all():
                n_bad = int((sv != ov).sum())
                print(f"  VALUE MISMATCH col={c} n={n_bad}")
                bad = np.where(sv != ov)[0][:3]
                for i in bad:
                    print(f"    row{i}: spark={sv[i]!r} oracle={ov[i]!r}")
                ok = False
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--json",
        default=None,
        help="write per-query verdicts to this artifact (ORACLES_LOCAL.json);"
        " tests/test_registry_coverage.py asserts the committed artifact"
        " still covers the whole registry all-green",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry
    from radar_output_restructure_spark import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb_con(args.sf)
    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = args.queries or list(queries)
    n_pass = n_fail = n_noracle = 0
    results: dict[str, str] = {}
    for name in names:
        if name not in queries:
            print(f"{name}: NOT REGISTERED")
            n_fail += 1
            results[name] = "fail"
            continue
        # per-query isolation: one raising query must not mask the rest of
        # the registry (the whole-gate abort is how a single bug hid three
        # queries from an entire round's correctness file)
        try:
            sdf = queries[name](spark, args.sf).toPandas()
            if name not in oracles:
                print(f"{name}: no oracle (rows-only) -> {len(sdf)} rows")
                n_noracle += 1
                results[name] = "rows-only"
                continue
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            n_fail += 1
            results[name] = "fail"
            continue
        print(f"{name}: spark={len(sdf)} oracle={len(odf)}")
        if compare(name, sdf, odf):
            print("  OK")
            n_pass += 1
            results[name] = "pass"
        else:
            n_fail += 1
            results[name] = "fail"
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(
                {
                    "sf": args.sf,
                    "registry_size": len(queries),
                    "results": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
