#!/usr/bin/env python3
"""Static oracle output-type guard (no query execution).

Usage: check_oracle_types.py <sfDir> <oracleJson>

DESCRIBEs each oracle SQL in DuckDB over views of the sf parquet
tables and fails if any OUTPUT column resolves to HUGEINT or DECIMAL —
the widening class (SUM(BIGINT) -> HUGEINT, SUM() OVER -> decimal128)
that hash-mismatches against Spark's int64 in the driver compare even
when every value is equal. Spark-side results are int64/double/string/
binary/bool/list everywhere, so any decimal-family oracle column is a
missing CAST until proven otherwise (allowlist below).
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# query -> columns allowed to be decimal-family (none today; add a pair
# here only with a matching DecimalType on the Spark side)
ALLOW = {}

BAD = ("HUGEINT", "DECIMAL", "UHUGEINT")

def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad.append((name, "<describe failed>", str(e)[:200]))
            continue
        for col, typ, *_ in rows:
            if any(b in typ.upper() for b in BAD) \
                    and col not in ALLOW.get(name, ()):
                bad.append((name, col, typ))
    for name, col, typ in bad:
        print(f"FAIL {name}: column '{col}' is {typ}")
    print(f"== {len(oracle) - len(set(n for n, _, _ in bad))} ok / "
          f"{len(set(n for n, _, _ in bad))} bad ==")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
