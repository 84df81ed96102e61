#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this just lets us check oracle SQL
against Spark output before the round gate does).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet tables,
and compares: column names (sorted), row counts, and values (sorted rows,
with small float tolerance reporting).
"""
import json
import sys
import duckdb
import pandas as pd
import numpy as np
import glob
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    import datetime
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(
                df[c].dropna().iloc[0] if len(df[c].dropna()) else None,
                datetime.date):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # _errors.json records queries that THREW inside Verify. An oracled
    # query also fails below on missing output, but a ROWS-ONLY query
    # that threw would otherwise vanish from this report entirely.
    err_path = os.path.join(out_dir, "_errors.json")
    errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    for name, msg in sorted(errors.items()):
        print(f"FAIL {name}: threw in Verify: {msg}")
        if name not in oracles:
            n_fail += 1  # oracled ones are counted by the loop below
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in spark_files])
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got, exp = canon(got), canon(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        ok = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                aa = a.astype(float).to_numpy()
                bb = b.astype(float).to_numpy()
                bad = ~(np.isclose(aa, bb, rtol=0, atol=1e-9) |
                        (np.isnan(aa) & np.isnan(bb)))
                exact = (aa == bb) | (np.isnan(aa) & np.isnan(bb))
                if bad.any():
                    i = int(np.argmax(bad))
                    print(f"FAIL {name}: col {c} row {i}: spark={aa[i]!r} oracle={bb[i]!r}")
                    ok = False
                    break
                elif not exact.all():
                    i = int(np.argmax(~exact))
                    print(f"WARN {name}: col {c} inexact float (row {i}: "
                          f"{aa[i]!r} vs {bb[i]!r}) — may hash-mismatch")
            else:
                if a.dtype != b.dtype:
                    print(f"WARN {name}: col {c} dtype spark={a.dtype} oracle={b.dtype}")
                av = a.astype(object).where(pd.notna(a), None).tolist()
                bv = b.astype(object).where(pd.notna(b), None).tolist()
                if av != bv:
                    i = next(j for j in range(len(av)) if av[j] != bv[j])
                    print(f"FAIL {name}: col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(SparkOnly(out_dir, oracles))} rows-only")
    return 1 if n_fail else 0


def SparkOnly(out_dir, oracles):
    dirs = [d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d)) and d not in oracles]
    return dirs


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
