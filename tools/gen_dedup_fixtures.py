#!/usr/bin/env python3
"""Independent-implementation fixtures for the near-dup sketch operators:
reimplements, in Python with no engine code, word/char shingling, MinHash
band keys, SimHash, the max-bucket guard, exact Jaccard verification and
HALF_UP rounding (graft.queries.Shingles + DedupQueries), pinning the exact
expected outputs of dedup_minhash / dedup_simhash / dedup_ngram at sf0.01.

Usage: gen_dedup_fixtures.py <sfDir> <minhash_out> <simhash_out> <ngram_out>
"""
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

M = (1 << 64) - 1
FNV_OFF = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
GOLDEN = 0x9E3779B97F4A7C15
MAX_BUCKET = 128  # DedupQueries.MaxBucket


def signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def unsigned(h):
    return h & M


def round4(x):
    return float(Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def mix(z):
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def fnv(s, seed):
    h = FNV_OFF ^ seed
    for c in s:
        h = ((h ^ ord(c)) * FNV_PRIME) & M
    return h


def java_split_space(text):
    # Java String.split(" ") drops TRAILING empty strings only
    parts = text.split(" ")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def word_shingles(text, k):
    words = java_split_space(text)
    if len(words) < k:
        return [signed(fnv(text, 0))]
    out = set()
    for i in range(len(words) - k + 1):
        h = FNV_OFF
        for j in range(k):
            for c in words[i + j]:
                h = ((h ^ ord(c)) * FNV_PRIME) & M
            h = ((h ^ ord(" ")) * FNV_PRIME) & M
        out.add(signed(h))
    return sorted(out)  # TreeSet order = signed


def char_shingles(text, k):
    if len(text) < k:
        return [signed(fnv(text, 1))]
    out = set()
    for i in range(len(text) - k + 1):
        h = FNV_OFF
        for j in range(k):
            h = ((h ^ ord(text[i + j])) * FNV_PRIME) & M
        out.add(signed(h))
    return sorted(out)


def minhash_band_keys(shingles, n_hashes, bands):
    sig = [(1 << 63) - 1] * n_hashes  # Long.MaxValue, SIGNED mins
    for s in shingles:
        su = unsigned(s)
        for h in range(n_hashes):
            v = signed(mix(su ^ ((h * GOLDEN) & M)))
            if v < sig[h]:
                sig[h] = v
    rows = n_hashes // bands
    keys = []
    for b in range(bands):
        h = FNV_OFF ^ b
        for r in range(rows):
            h = ((h ^ unsigned(sig[b * rows + r])) * FNV_PRIME) & M
        keys.append(signed(h))
    return keys


def simhash(shingles):
    acc = [0] * 64
    for s in shingles:
        h = mix(unsigned(s))
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return signed(out)


def guarded_pairs(doc_keys):
    """doc_keys: {doc_id: [band_key,...]} -> distinct (a,b) pairs a<b within
    buckets holding <= MAX_BUCKET members."""
    buckets = {}
    for i, keys in doc_keys.items():
        for k in keys:
            buckets.setdefault(k, []).append(i)
    pairs = set()
    for members in buckets.values():
        if len(members) > MAX_BUCKET:
            continue
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
    return pairs


def jaccard(a, b):
    sa, sb = set(a), set(b)
    return round4(len(sa & sb) / max(len(sa | sb), 1))


def write(out, cols):
    pq.write_table(pa.table(cols), out)


def main(sf_dir, minhash_out, simhash_out, ngram_out):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    docs = {int(i): t for i, t in rows}
    ids = sorted(docs)

    # ---- dedup_minhash ----------------------------------------------------
    wsh = {i: word_shingles(t, 3) for i, t in docs.items()}
    keys = {i: minhash_band_keys(s, 32, 8) for i, s in wsh.items()}
    cand = {}  # doc -> list of jaccard
    for a, b in guarded_pairs(keys):
        j = jaccard(wsh[a], wsh[b])
        cand.setdefault(a, []).append(j)
        cand.setdefault(b, []).append(j)
    write(minhash_out, {
        "doc_id": pa.array(ids, pa.int64()),
        "n_shingles": pa.array([len(wsh[i]) for i in ids], pa.int32()),
        "n_candidates": pa.array(
            [len(cand.get(i, [])) for i in ids], pa.int64()),
        "best_jaccard": pa.array(
            [round4(max(cand[i])) if i in cand else 0.0 for i in ids],
            pa.float64()),
    })

    # ---- dedup_simhash ----------------------------------------------------
    sh = {i: simhash(wsh[i]) for i in ids}
    skeys = {}
    for i in ids:
        u = unsigned(sh[i])
        skeys[i] = [f"0:{signed(u) >> 48 & 65535}",
                    f"1:{signed(u) >> 32 & 65535}",
                    f"2:{signed(u) >> 16 & 65535}",
                    f"3:{u & 65535}"]
    near = {}
    for a, b in guarded_pairs(skeys):
        ham = bin(unsigned(sh[a]) ^ unsigned(sh[b])).count("1")
        if ham <= 8:
            near.setdefault(a, []).append(ham)
            near.setdefault(b, []).append(ham)
    write(simhash_out, {
        "doc_id": pa.array(ids, pa.int64()),
        "simhash": pa.array([sh[i] for i in ids], pa.int64()),
        "n_near": pa.array([len(near.get(i, [])) for i in ids], pa.int64()),
        "min_hamming": pa.array(
            [min(near[i]) if i in near else 64 for i in ids], pa.int32()),
    })

    # ---- dedup_ngram ------------------------------------------------------
    csh = {i: char_shingles(t, 4) for i, t in docs.items()}
    nkeys = {i: minhash_band_keys(s, 16, 4) for i, s in csh.items()}
    ncand = {}
    for a, b in guarded_pairs(nkeys):
        j = jaccard(csh[a], csh[b])
        ncand.setdefault(a, []).append(j)
        ncand.setdefault(b, []).append(j)
    write(ngram_out, {
        "doc_id": pa.array(ids, pa.int64()),
        "n_ngrams": pa.array([len(csh[i]) for i in ids], pa.int32()),
        "n_candidates": pa.array(
            [len(ncand.get(i, [])) for i in ids], pa.int64()),
        "best_ngram_jaccard": pa.array(
            [round4(max(ncand[i])) if i in ncand else 0.0 for i in ids],
            pa.float64()),
    })
    print(f"wrote {len(ids)} rows each -> {minhash_out}, {simhash_out}, "
          f"{ngram_out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
