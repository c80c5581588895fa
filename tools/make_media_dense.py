#!/usr/bin/env python3
"""Byte-exact duplication fixture for the collapse-first media-dedup
curve (r14; verdict item 1 follow-through). make_sf1.py deliberately
token-renames its copies so cross-copy text relations vanish — which
also makes every copy byte-DIFFERENT, so an exact collapse never
bites there. Real media duplication is the opposite shape: mirrored
collections are byte-identical files. This generator produces that
shape: D exact copies of the base documents table (only doc_id
changes), so content signatures — and payload bytes — repeat exactly
D times.

On this corpus the pairwise path's candidate/pair set grows with
n_base·C(D,2) (quadratic in duplication) while the collapsed path's
quadratic stage sees n_base distinct signatures regardless of D —
the curve the deployment guidance claims.

Usage: make_media_dense.py <baseSfDir> <outDir> <copies>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(base, out, copies):
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(base, "documents.parquet"))
    n = t.num_rows
    ids = t["doc_id"].to_pylist()
    offset = max(ids) + 1
    parts = []
    for k in range(copies):
        cols = {name: t[name] for name in t.column_names}
        cols["doc_id"] = pa.array([i + k * offset for i in ids],
                                  type=pa.int64())
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(out, "documents.parquet"))
    for f in os.listdir(base):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(base, f), dst)
    print(f"wrote {n * copies} docs ({copies}x exact copies of {n}) -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
