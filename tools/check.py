#!/usr/bin/env python3
"""Local correctness gate mirroring the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <outDir>
  - expects <outDir>/<name>/ parquet dirs written by graft.Verify
  - expects <outDir>/oracle_sql.json
Compares each query result against DuckDB running the oracle SQL over the
same parquet fixtures. Strictness mirrors the driver (round-2 lesson):
  - arrow FIELD TYPES must match exactly (the driver hashes the declared
    type — a decimal(24,2) vs decimal(38,2) difference fails even when
    every value is string-identical). Nullability is NOT compared (the
    driver tolerates Spark's non-null count vs DuckDB's nullable count).
  - values compare on exact repr: Decimal and int exact; floats by
    shortest-roundtrip repr (bit-exact up to -0.0/NaN-payload).
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pds

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # fold -0.0
        return repr(v)
    if isinstance(v, (int,)):
        return str(v)
    return str(v)

def norm_type(t):
    # LIST-child field names are engine incidentals (Spark 'element' vs
    # DuckDB 'l') — erase only those; struct field names are part of the
    # contract and must still compare (a bare `<name: ` would also strip
    # the FIRST struct field's name and mask a real mismatch)
    import re
    return re.sub(r"\b((?:large_|fixed_size_)?list)<[^:<>]+: ", r"\1<", str(t))

def norm_table(tbl):
    cols = sorted(tbl.column_names)
    types = {f.name: norm_type(f.type) for f in tbl.schema}
    data = tbl.select(cols).to_pylist()
    rows = sorted(tuple(norm_cell(r[c]) for c in cols) for r in data)
    return cols, types, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); fail += 1; continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
        gc, gt, gr = norm_table(got)
        ec, et, er = norm_table(exp)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}"); fail += 1; continue
        badtypes = [(c, gt[c], et[c]) for c in gc if gt[c] != et[c]]
        if badtypes:
            print(f"FAIL {name}: type mismatch {badtypes}"); fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}"); fail += 1; continue
        if gr != er:
            bad = next(i for i,(a,b) in enumerate(zip(gr,er)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:\n  got {gr[bad]}\n  exp {er[bad]}")
            fail += 1; continue
        print(f"OK   {name} ({len(gr)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
