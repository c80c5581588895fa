#!/usr/bin/env python3
"""Build an sf1-scale fixture (10x sf0.1) for the scale-curve evidence
run (round-10 verdict item 2): measure the most expensive queries at
10x bench scale and check the cost curves bend the way the plan
comments say.

Upsampling is structure-preserving, not naive replication (which would
make every doc a 10-way dup and inflate pair workloads ~100x instead
of 10x):

- documents: 10 copies; copy k>0 renames the vocabulary by appending
  the copy digit to EVERY word (re.sub keeps all whitespace, so line
  structure survives for dedup_lines). A bijective token rename is an
  isomorphism of the text's relational structure: within-copy
  exact-dup / near-dup / shingle relations are exactly the base's,
  while copies share zero vocabulary so no cross-copy pairs appear.
  doc_id offset per copy; n_chars recomputed (~+12% chars from the
  suffixes -- noted where ratios are read).
- embeddings: 10 copies; copy k rotates each vector by 5k positions.
  Rotation is applied uniformly within a copy, so pairwise dot
  products (hence the near-dup cosine structure) are preserved
  exactly; rotated random vectors are ~orthogonal across copies.
- events: 10 copies; event_id/user_id offset per copy, timestamps
  unchanged -- 10x users with the base's per-user session patterns,
  10x rows per hourly window, same window count.
- all other tables: copied as-is (the expensive-query set is
  documents/embeddings/events-bound; q*/TPC-H lines stay sf0.1 and
  are excluded from the ratio table).

Usage: make_sf1.py <baseSfDir> <outDir>
"""
import os
import re
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

COPIES = 10  # overridable via argv[3] (e.g. 3 for a 30x point)


def upsample_documents(base, out):
    t = pq.read_table(f"{base}/documents.parquet")
    n_ids = max(x for x in t.column("doc_id").to_pylist() if x is not None) + 1
    doc_id, text, lang, source, n_chars = [], [], [], [], []
    rows = t.to_pylist()
    for k in range(COPIES):
        sfx = "" if k == 0 else str(k)
        for r in rows:
            doc_id.append(None if r["doc_id"] is None else r["doc_id"] + k * n_ids)
            tx = r["text"]
            if tx is not None and sfx:
                tx = re.sub(r"\S+", lambda m: m.group(0) + sfx, tx)
            text.append(tx)
            lang.append(r["lang"])
            source.append(r["source"])
            # copy 0 is byte-faithful to the base fixture: carry its
            # n_chars through unchanged (recomputing would silently
            # diverge if the base ever has n_chars != len(text))
            if k == 0:
                n_chars.append(r["n_chars"])
            else:
                n_chars.append(len(tx) if tx is not None else r["n_chars"])
    out_t = pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(out_t, f"{out}/documents.parquet")
    print(f"documents: {len(rows)} -> {out_t.num_rows}")


def upsample_embeddings(base, out):
    t = pq.read_table(f"{base}/embeddings.parquet")
    rows = t.to_pylist()
    n_ids = max(r["vec_id"] for r in rows if r["vec_id"] is not None) + 1
    dim = next((len(r["embedding"]) for r in rows if r["embedding"]), 1)
    vec_id, emb, label = [], [], []
    for k in range(COPIES):
        rot = (5 * k) % dim
        for r in rows:
            vec_id.append(None if r["vec_id"] is None else r["vec_id"] + k * n_ids)
            v = r["embedding"]
            emb.append(v[rot:] + v[:rot] if v is not None else None)
            label.append(r["label"])
    out_t = pa.table(
        {
            "vec_id": pa.array(vec_id, pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
            "label": pa.array(label, pa.int32()),
        }
    )
    pq.write_table(out_t, f"{out}/embeddings.parquet")
    print(f"embeddings: {len(rows)} -> {out_t.num_rows}")


def upsample_events(base, out):
    t = pq.read_table(f"{base}/events.parquet")
    n_ev = t.num_rows
    eid = t.column("event_id").to_pylist()
    # offset by max+1 like the other tables — offsetting by row count
    # would collide copies whenever ids are sparse
    n_eids = max(e for e in eid if e is not None) + 1
    uid = t.column("user_id").to_pylist()
    n_users = max(u for u in uid if u is not None) + 1
    parts = []
    for k in range(COPIES):
        c = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pa.array(
                [None if e is None else e + k * n_eids for e in eid], pa.int64()
            ),
        )
        c = c.set_column(
            c.schema.get_field_index("user_id"),
            "user_id",
            pa.array([None if u is None else u + k * n_users for u in uid], pa.int64()),
        )
        parts.append(c)
    out_t = pa.concat_tables(parts)
    pq.write_table(out_t, f"{out}/events.parquet")
    print(f"events: {n_ev} -> {out_t.num_rows}")


def main():
    global COPIES
    base, out = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        COPIES = int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    upsample_documents(base, out)
    upsample_embeddings(base, out)
    upsample_events(base, out)
    for f in sorted(os.listdir(base)):
        if f.endswith(".parquet") and f not in (
            "documents.parquet",
            "embeddings.parquet",
            "events.parquet",
        ):
            shutil.copy(f"{base}/{f}", f"{out}/{f}")
            print(f"copied {f}")


if __name__ == "__main__":
    main()
