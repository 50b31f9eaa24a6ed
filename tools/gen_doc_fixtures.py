#!/usr/bin/env python3
"""Independent-implementation fixture generator for the doc-level oracle
twins: recomputes, in Python (no engine code), the per-document values the
Scala kernels produce — FNV-1a fingerprint (TextQueries.LangId.rollingHash),
GPT-2-style BPE token count (TextQueries.BpeCount), and the char-bigram
language-ID prediction (TextQueries.LangId.predict) — and writes them as a
parquet fixture the DuckDB oracle SQL joins against.

The corpus text is printable ASCII, so Python's per-codepoint iteration is
identical to Java's per-UTF-16-unit iteration.

Usage: gen_doc_fixtures.py <documents.parquet> <out.parquet>
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import regex

M = (1 << 64) - 1

# Java Pattern from TextQueries.BpeCount (the public GPT-2 pre-tokenizer
# shape); `regex` supports \p{L}/\p{N} and leftmost-first alternation like
# java.util.regex.
BPE = regex.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")

LANGS = ["en", "fr", "de", "es", "zh"]


def signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def fingerprint(text):
    h = 0xCBF29CE484222325
    for c in text:
        h = ((h ^ ord(c)) * 0x100000001B3) & M
    return signed(h)


def predict(text):
    scores = [0.0] * len(LANGS)
    n = min(len(text), 512)
    i = 0
    while i < n - 1:
        bg = (ord(text[i]) << 16) | ord(text[i + 1])
        for l in range(len(LANGS)):
            z = (bg ^ ((l * 0x9E3779B97F4A7C15) & M)) & M
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
            z ^= z >> 31
            scores[l] += (z >> 11) * 1.1102230246251565e-16
        i += 2
    best = 0
    for l in range(1, len(LANGS)):
        if scores[l] > scores[best]:
            best = l
    return LANGS[best]


def main(docs_path, out_path):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{docs_path}' ORDER BY doc_id").fetchall()
    ids, fps, bpes, preds = [], [], [], []
    for doc_id, text in rows:
        ids.append(int(doc_id))
        fps.append(fingerprint(text))
        bpes.append(len(BPE.findall(text)))
        preds.append(predict(text))
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fingerprint": pa.array(fps, pa.int64()),
        "bpe_tokens": pa.array(bpes, pa.int64()),
        "predicted": pa.array(preds, pa.string()),
    })
    pq.write_table(table, out_path)
    print(f"wrote {len(ids)} fixture rows -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
