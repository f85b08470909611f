#!/usr/bin/env python3
"""Local correctness gate mirroring the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <outDir> [namePrefix...]
  - expects <outDir>/<name>/ parquet dirs written by graft.Verify
  - expects <outDir>/oracle_sql.json

Round-5 lesson: the driver compares at the PANDAS level, not the arrow
level. It reads the oracle via duckdb `.fetchdf()` (which converts DECIMAL
columns to float64) and the Spark parquet via pyarrow `.to_pandas()` (which
keeps decimals as object Decimal), then `sort_values` over the sorted
column list and hashes cell values. Consequences this gate must reproduce:
  - a Decimal-typed Spark output NEVER hash-matches a decimal oracle
    (object Decimal vs float64) even when every digit is equal → query
    outputs must be double/int/string, decimals only internal;
  - tz-aware Spark timestamps (datetime64[us, UTC]) never match DuckDB's
    naive datetime64[us] → output NTZ or unix micros;
  - numpy-array cells make the driver's sort_values throw
    (unhashable type) → never output raw array columns.
"""
import json, sys
import duckdb
import pandas as pd
import pyarrow.dataset as pds


def norm_cell(v):
    # repr is bit-faithful for floats (shortest roundtrip); str for the rest
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == 0.0:
            return "0.0"
        return repr(v)
    return repr(v)


def compare(name, got_df, exp_df):
    gc, ec = sorted(got_df.columns), sorted(exp_df.columns)
    if gc != ec:
        return f"schema {gc} != {ec}"
    # the driver's sort — must not throw (unhashable numpy arrays do)
    try:
        g = got_df[gc].sort_values(gc).reset_index(drop=True)
        e = exp_df[ec].sort_values(ec).reset_index(drop=True)
    except Exception as ex:
        return f"driver sort_values would fail: {type(ex).__name__}: {ex}"
    if len(g) != len(e):
        return f"rows {len(g)} != {len(e)}"
    # dtype parity: object-Decimal vs float64 is exactly the class of
    # mismatch the driver's hash sees. Compare pandas dtype strings.
    bad = [(c, str(g[c].dtype), str(e[c].dtype)) for c in gc
           if str(g[c].dtype) != str(e[c].dtype)]
    if bad:
        return f"pandas dtype mismatch {bad}"
    for c in gc:
        gv, ev = list(g[c]), list(e[c])
        for i, (a, b) in enumerate(zip(gv, ev)):
            if norm_cell(a) != norm_cell(b):
                return f"value mismatch col {c} sorted row {i}: got {norm_cell(a)} exp {norm_cell(b)}"
    return None


def main(sf_dir, out_dir, prefixes):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            got = pds.dataset(f"{out_dir}/{name}").to_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); fail += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
        err = compare(name, got, exp)
        if err:
            print(f"FAIL {name}: {err}"); fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
