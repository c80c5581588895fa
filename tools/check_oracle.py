#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: check_oracle.py <sfDir> <outDir>
Loads each <outDir>/<name> parquet result, runs <outDir>/oracle_sql.json's
SQL in DuckDB over the sf parquet tables, sorts columns by name and rows
by all values, and value-compares (floats to 9 sig digits).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [names[i] for i in order], out

def type_key(t):
    """Canonical type-class string for an Arrow type, loose enough that
    width-only differences pass but the driver-hash-breaking classes
    (decimal128/hugeint vs int64, decimal vs float) FAIL."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_key(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_key(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)

def type_parity(spark_tbl, duck_tbl):
    """Column-name-keyed type-class compare; returns list of
    (col, spark_type, duck_type) mismatches."""
    s = {f.name: type_key(f.type) for f in spark_tbl.schema}
    d = {f.name: type_key(f.type) for f in duck_tbl.schema}
    return [(c, s[c], d[c]) for c in sorted(set(s) & set(d)) if s[c] != d[c]]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # in-memory connections get no spill dir by default — big-SF media
    # oracles (recursive closures over the restated pair set) need one
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='96GB'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_path = os.path.join(out_dir, name)
        if not os.path.isdir(res_path):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        tbl = ds.dataset(res_path, format="parquet").to_table()
        s_names = tbl.column_names
        s_rows = [tuple(d[c] for c in s_names) for d in tbl.to_pylist()]
        try:
            d_tbl = con.execute(sql).fetch_arrow_table()
            d_names = d_tbl.column_names
            d_rows = [tuple(r[c] for c in d_names) for r in d_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}"); n_fail += 1; continue
        sc, sr = canon(s_rows, s_names)
        dc, dr = canon(d_rows, d_names)
        if sc != dc:
            print(f"FAIL {name}: schema {sc} != {dc}"); n_fail += 1; continue
        tmis = type_parity(tbl, d_tbl)
        if tmis:
            print(f"FAIL {name}: type mismatch {tmis}"); n_fail += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} != {len(dr)}"); n_fail += 1; continue
        if sr != dr:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}"); n_fail += 1; continue
        print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
