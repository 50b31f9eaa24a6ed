#!/usr/bin/env python3
"""Independent-implementation fixtures for the LSH similarity operators:
recomputes, in Python (no engine code), the exact expected outputs of the
`ann_lsh` and `dedup_embedding` queries — hyperplane buckets
(AnnQueries.Hyperplanes), double-precision cosine in Spark's evaluation
order, the max-bucket guard, HALF_UP rounding — so the driver's DuckDB
oracle can compare the Spark results against a from-scratch replica.

Usage: gen_ann_fixtures.py <embeddings.parquet> <ann_lsh_out> <dedup_emb_out>
"""
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

M = (1 << 64) - 1
MIN_PLANES = 8      # Hyperplanes.MinPlanes
TARGET_BUCKET = 16  # Hyperplanes.TargetBucket
MAX_PLANES = 28     # Hyperplanes.MaxPlanes
N_BANDS = 2         # Hyperplanes.NBands (dedup_embedding only)
MAX_BUCKET = 128    # DedupQueries.MaxBucket


def planes_for(n):
    # Hyperplanes.planesFor: ceil(log2(ceil(n / TargetBucket))), clamped;
    # integer-exact bit-length, same as the Scala numberOfLeadingZeros form
    buckets = max(1, (n + TARGET_BUCKET - 1) // TARGET_BUCKET)
    return min(MAX_PLANES, max(MIN_PLANES, (buckets - 1).bit_length()))


def weight(p, d):
    z = (((p << 32) | d) ^ 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    z ^= z >> 31
    return (z >> 11) * 1.1102230246251565e-16 * 2.0 - 1.0


def bucket(vec, nplanes, band=0):
    # band b uses the disjoint plane set [b*nplanes, (b+1)*nplanes)
    base = band * nplanes
    out = 0
    for p in range(nplanes):
        dot = 0.0
        for d, x in enumerate(vec):
            dot += weight(base + p, d) * x
        if dot > 0:
            out |= 1 << p
    return out


def cosine(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    den = max(na ** 0.5 * nb ** 0.5, 1e-12)
    return dot / den


def round4(x):
    # Spark round(double, 4) = HALF_UP on the full binary expansion
    return float(Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def main(emb_path, lsh_out, dedup_out):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{emb_path}' ORDER BY vec_id"
    ).fetchall()
    # float32 -> float64, matching Spark's cast(embedding as array<double>)
    vecs = {int(i): [float(x) for x in v] for i, v in rows}
    nplanes = planes_for(len(vecs))
    buckets = {i: bucket(v, nplanes) for i, v in vecs.items()}

    # ---- ann_lsh: per query (vec_id < 5), candidates = UNION of the
    # query's buckets across the N_BANDS independent bucketings ----------
    band_buckets = {i: [bucket(v, nplanes, b) for b in range(N_BANDS)]
                    for i, v in vecs.items()}
    q_ids, cands, top1s, coss = [], [], [], []
    for q in sorted(i for i in vecs if i < 5):
        members = [i for i in vecs
                   if i != q and any(band_buckets[i][b] == band_buckets[q][b]
                                     for b in range(N_BANDS))]
        q_ids.append(q)
        cands.append(len(members))
        if members:
            scored = sorted(((cosine(vecs[q], vecs[i]), i) for i in members),
                            key=lambda t: (-t[0], t[1]))
            top_cos, top_id = scored[0]
            top1s.append(top_id)
            coss.append(round4(top_cos))
        else:
            top1s.append(-1)
            coss.append(0.0)
    pq.write_table(pa.table({
        "q_id": pa.array(q_ids, pa.int64()),
        "bucket_candidates": pa.array(cands, pa.int64()),
        "lsh_top1": pa.array(top1s, pa.int64()),
        "lsh_cos": pa.array(coss, pa.float64()),
    }), lsh_out)

    # ---- dedup_embedding: cos >= 0.95 pairs inside guarded banded buckets
    # N_BANDS independent bucketings; candidate pairs deduped across bands
    # before the exact cosine verify (same as the Spark distinct())
    by_key = {}
    for i, v in vecs.items():
        for band in range(N_BANDS):
            key = (band, bucket(v, nplanes, band))
            by_key.setdefault(key, []).append(i)
    dropped_entries = sum(len(m) for m in by_key.values()
                          if len(m) > MAX_BUCKET)
    dropped_frac = round4(dropped_entries / max(1, N_BANDS * len(vecs)))
    cand = set()
    for key, members in by_key.items():
        if len(members) > MAX_BUCKET:
            continue  # the guard drops hot buckets before the self-join
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    near = {}  # vec_id -> list of cos
    for ia, ib in cand:
        c = cosine(vecs[ia], vecs[ib])
        if c >= 0.95:
            near.setdefault(ia, []).append(c)
            near.setdefault(ib, []).append(c)
    ids = sorted(vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "bucket": pa.array([buckets[i] for i in ids], pa.int32()),
        "n_near_dups": pa.array(
            [len(near.get(i, [])) for i in ids], pa.int64()),
        "max_cos": pa.array(
            [round4(max(near[i])) if i in near else 0.0 for i in ids],
            pa.float64()),
        "dropped_bucket_frac": pa.array(
            [dropped_frac] * len(ids), pa.float64()),
    }), dedup_out)
    print(f"wrote {len(q_ids)} lsh rows -> {lsh_out}; "
          f"{len(ids)} dedup rows -> {dedup_out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
