#!/usr/bin/env python3
"""Build an adversarial-documents fixture dir for the suite-wide oracle
sweep (round-9 stretch): every non-documents table is the base SF's,
documents.parquet is replaced by a corpus of null/empty/whitespace-only
texts, NFC-vs-NFD forms, case-folding edge cases, CJK (single giant
token), emoji+ZWJ, RTL scripts, combining-mark stacks, exact and near
duplicates, plus a few docs carrying the BM25 query terms -- the
normalizeText/NFC and null-handling contracts, exercised through EVERY
declared query rather than per-operator specs.

Usage: make_adversarial.py <baseSfDir> <outDir>
"""
import sys, os, shutil, unicodedata
import pyarrow as pa
import pyarrow.parquet as pq

def texts():
    t = []
    # null / degenerate
    t.append(None)
    t.append("")
    t.append(" ")
    t.append(" \t\n\r ")
    t.append("one")
    t.append("one two")
    # exact duplicates (dedup family must group them)
    t.append("exact duplicate body spark join filter twice over")
    t.append("exact duplicate body spark join filter twice over")
    # near duplicates sharing long shingle runs (dedup_substring runs)
    t.append("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    t.append("alpha beta gamma delta epsilon zeta eta theta prefix only")
    # NFC vs NFD of the same word (the normalizer contract): composed
    # e-acute vs e + COMBINING ACUTE
    t.append(unicodedata.normalize("NFC", "caf\u00e9 au lait"))
    t.append(unicodedata.normalize("NFD", "caf\u00e9 au lait"))
    # case folding oddities
    t.append("İstanbul STRASSE straße SS ss")
    # CJK, no spaces -> one giant token
    t.append("大規模言語モデルの学習データ")
    # emoji + ZWJ family, skin-tone modifier
    t.append("family \U0001F468‍\U0001F469‍\U0001F467 wave \U0001F44B\U0001F3FD done")
    # RTL Arabic + Hebrew with LTR digits
    t.append("مرحبا 123 שלום")
    # combining-mark stack (zalgo-lite)
    t.append("z̀́̂̃̄ a̖̗̘ text")
    # Unicode whitespace variants between tokens (NBSP, ideographic)
    t.append("left middle　right")
    # very long doc: windows/pack/tfidf stress
    t.append(" ".join(["tok%d" % (i % 97) for i in range(3000)]))
    # BM25 query-term carriers with varied tf and length
    t.append("spark join filter spark join filter spark")
    t.append("join " * 30 + "filter")
    t.append("filter")
    # digits / symbols for the BPE-ish tokenizer + redaction patterns
    t.append("a1b2c3 42 919-555-0100 x@y.zz 10.0.0.1")
    # mixed scripts in one token
    t.append("abcдеф αβγabc")
    return t

def main(base, out):
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(base):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(base, f), dst)
    ts = texts()
    # repeat the corpus a few times with distinct ids so quantile /
    # sampling paths see more than a handful of rows per source
    rows = []
    for rep in range(4):
        for i, tx in enumerate(ts):
            did = rep * 1000 + i
            rows.append({
                "doc_id": did,
                "text": tx,
                "lang": ["en", "es", "zh", "ar"][did % 4],
                "source": "src%d" % (did % 3),
                "n_chars": 0 if tx is None else len(tx),
            })
    table = pa.Table.from_pylist(rows, schema=pa.schema([
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]))
    pq.write_table(table, os.path.join(out, "documents.parquet"))
    print("wrote %d adversarial docs -> %s" % (table.num_rows, out))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
