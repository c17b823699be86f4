#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
testdata tables and compare values (columns sorted by name, rows sorted).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    # Sort BEFORE stringifying, mirroring the driver's harness: an
    # ARRAY-typed output column crashes pandas sort_values there
    # ("unhashable type: numpy.ndarray"), and round 5 proved a local gate
    # that stringifies first silently passes queries the driver cannot
    # check. Queries must emit scalar columns (array_join/to_json/explode).
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def compare(name, spark_df, oracle_df):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA col names {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~(
                (av.isna() & bv.isna())
                | (abs(av - bv) <= 1e-9 + 1e-9 * abs(bv))
            )
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        if bad.any():
            i = bad.idxmax()
            return f"VALUE col={c} row={i}: spark={a[c][i]!r} oracle={b[c][i]!r} ({int(bad.sum())} bad)"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = 0
    for name in names:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(spark_df)} rows)"
                  + ("  [EMPTY!]" if len(spark_df) == 0 else ""))
            n_ok += 1 if len(spark_df) > 0 else 0
            n_bad += 0 if len(spark_df) > 0 else 1
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            err = compare(name, spark_df, oracle_df)
        except TypeError as e:
            # the driver's harness dies the same way on non-scalar columns
            err = f"HARNESS-INCOMPATIBLE output ({str(e)[:120]})"
        if err:
            print(f"  ✗ {name}: {err}")
            n_bad += 1
        else:
            print(f"  ✓ {name} ({len(spark_df)} rows)")
            n_ok += 1
    missing = sorted(set(oracles) - set(names))
    for m in missing:
        print(f"  ✗ {m}: oracle present but NO spark output")
        n_bad += 1
    print(f"{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
