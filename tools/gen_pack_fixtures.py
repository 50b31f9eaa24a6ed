#!/usr/bin/env python3
"""Independent from-scratch replica of the seq_pack operator, pinning its
expected output as a golden fixture (same whole-pipeline-fixture pattern as
gen_ann_fixtures.py).

Spec being replicated (see PackQueries.scala / Pack.scala):
  grp  = docKey(doc_id) % 32, where docKey = first 15 hex chars of
         md5(doc_id) as an int (format-free — no id-scheme assumption);
  within each grp, docs ordered by doc_id; greedy sequential packing into
  4096-token bins: a bin closes when the next doc would overflow it.
Aggregate per grp: n_bins, n_docs, n_tokens, pad_tokens.

Usage: gen_pack_fixtures.py [corpus_parquet_glob] [out_parquet]
"""
import hashlib
import sys

import duckdb

CORPUS = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/repo/data/oracle/corpus_n5000.parquet/*.parquet"
OUT = sys.argv[2] if len(sys.argv) > 2 else \
    "/root/repo/golden/pack_fixture_n5000.parquet"
GROUPS = 32
BIN_LEN = 4096


def doc_key(doc_id):
    return int(hashlib.md5(doc_id.encode("utf-8")).hexdigest()[:15], 16)


rows = duckdb.sql(
    f"SELECT doc_id, n_tok FROM read_parquet('{CORPUS}') ORDER BY doc_id"
).fetchall()

groups = {}
for doc_id, n_tok in rows:
    g = doc_key(doc_id) % GROUPS
    groups.setdefault(g, []).append((doc_id, n_tok))

out = []
for g in sorted(groups):
    docs = sorted(groups[g])  # doc_id order within the group
    n_bins = 0
    used = BIN_LEN + 1  # force a new bin on the first doc
    total = 0
    for _, n in docs:
        assert n <= BIN_LEN, "doc exceeds bin capacity"
        if used + n > BIN_LEN:
            n_bins += 1
            used = 0
        used += n
        total += n
    out.append((g, n_bins, len(docs), total, n_bins * BIN_LEN - total))

con = duckdb.connect()
con.execute("""CREATE TABLE fixture (grp BIGINT, n_bins BIGINT,
    n_docs BIGINT, n_tokens BIGINT, pad_tokens BIGINT)""")
con.executemany("INSERT INTO fixture VALUES (?, ?, ?, ?, ?)", out)
con.execute(f"COPY fixture TO '{OUT}' (FORMAT PARQUET)")
print(f"wrote {len(out)} groups to {OUT}")
print(con.execute(
    "SELECT sum(n_bins), sum(n_docs), sum(n_tokens), sum(pad_tokens),"
    " round(sum(n_tokens) * 1.0 / (sum(n_tokens) + sum(pad_tokens)), 4)"
    " FROM fixture").fetchall())
