#!/usr/bin/env python3
"""Independent-implementation fixtures for ann_ivf and multimodal_features:
reimplements, in Python with no engine code, the deterministic k-means
coarse quantizer + probe search (AnnQueries.Ivf) and the stub media feature
extractor (MultimodalQueries.StubDecoder), pinning the exact expected query
outputs at sf0.01.

Usage: gen_ivf_multimodal_fixtures.py <sfDir> <ivf_out> <mm_out> <recall_out>
"""
import math
import sys
import zlib
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

ITERS = 2
NPROBE = 4


def k_for(n):
    # Ivf.kFor: ceil(sqrt(n)) clamped to [4, 4096] — integer-exact isqrt
    r = math.isqrt(n)
    k = r if r * r >= n else r + 1
    return max(4, min(4096, k))


def sample_modulus(n, k):
    # Ivf.sampleModulus: smallest m >= 7 with n/m <= k*128
    return max(7, (n + k * 128 - 1) // (k * 128))


def round4(x):
    return float(Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP))


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


def dist2(a, b):
    s = 0.0
    for x, y in zip(a, b):
        d = x - y
        s += d * d
    return s


def nearest(cents, v):
    best, bd = 0, dist2(cents[0], v)
    for c in range(1, len(cents)):
        d = dist2(cents[c], v)
        if d < bd:
            bd, best = d, c
    return best


def train(sample, k):
    cents = [list(sample[(c * len(sample)) // k]) for c in range(k)]
    dim = len(sample[0])
    for _ in range(ITERS):
        sums = [[0.0] * dim for _ in range(k)]
        counts = [0] * k
        for v in sample:
            c = nearest(cents, v)
            counts[c] += 1
            for d in range(dim):
                sums[c][d] += v[d]
        cents = [cents[c] if counts[c] == 0
                 else [s / counts[c] for s in sums[c]]
                 for c in range(k)]
    return cents


def gen_ivf(sf_dir, out, recall_out):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    vecs = {int(i): [float(x) for x in v] for i, v in rows}
    k = k_for(len(vecs))
    m = sample_modulus(len(vecs), k)
    sample = [vecs[i] for i in sorted(vecs) if i % m == 0][:k * 256]
    cents = train(sample, k)
    assigned = {i: nearest(cents, v) for i, v in vecs.items()}
    out_rows = []
    for q in sorted(i for i in vecs if i < 5):
        probe = sorted(range(k), key=lambda c: dist2(cents[c], vecs[q]))[:NPROBE]
        probe_set = set(probe)
        members = [i for i in vecs
                   if i != q and assigned[i] in probe_set]
        scored = sorted(((cosine(vecs[q], vecs[i]), i) for i in members),
                        key=lambda t: (-t[0], t[1]))
        brute = sorted(((cosine(vecs[q], vecs[i]), i)
                        for i in vecs if i != q),
                       key=lambda t: (-t[0], t[1]))
        ivf_top1 = scored[0][1] if scored else -1
        ivf_cos = round4(scored[0][0]) if scored else 0.0
        out_rows.append((q, ivf_top1, ivf_cos, brute[0][1],
                         len(members), ivf_top1 == brute[0][1]))
    pq.write_table(pa.table({
        "q_id": pa.array([r[0] for r in out_rows], pa.int64()),
        "ivf_top1": pa.array([r[1] for r in out_rows], pa.int64()),
        "ivf_cos": pa.array([r[2] for r in out_rows], pa.float64()),
        "probed_candidates": pa.array([r[4] for r in out_rows], pa.int64()),
    }), out)
    pq.write_table(pa.table({
        "q_id": pa.array([r[0] for r in out_rows], pa.int64()),
        "ivf_top1": pa.array([r[1] for r in out_rows], pa.int64()),
        "brute_top1": pa.array([r[3] for r in out_rows], pa.int64()),
        "top1_agrees": pa.array([r[5] for r in out_rows], pa.bool_()),
    }), recall_out)
    print(f"wrote {len(out_rows)} ivf rows -> {out}; recall -> {recall_out}")


def gen_multimodal(sf_dir, out):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    agg = {}  # modality -> [n, total_bytes, entropy_sum, max_width]
    for doc_id, text in rows:
        i = int(doc_id)
        modality = ("image", "audio", "video")[i % 3]
        payload = text.encode("utf-8")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        hist = [0] * 256
        for b in payload:
            hist[b] += 1
        h = 0.0
        n = max(1, len(payload))
        for c in range(256):
            if hist[c] > 0:
                p = hist[c] / n
                h -= p * math.log(p) / math.log(2.0)
        width = 64 + (crc % 512)
        a = agg.setdefault(modality, [0, 0, 0.0, 0])
        a[0] += 1
        a[1] += len(payload)
        a[2] += h
        a[3] = max(a[3], width)
    mods = sorted(agg)
    pq.write_table(pa.table({
        "modality": pa.array(mods, pa.string()),
        "n": pa.array([agg[m][0] for m in mods], pa.int64()),
        "total_bytes": pa.array([agg[m][1] for m in mods], pa.int64()),
        "avg_entropy": pa.array(
            [round4(agg[m][2] / agg[m][0]) for m in mods], pa.float64()),
        "max_width": pa.array([agg[m][3] for m in mods], pa.int32()),
    }), out)
    print(f"wrote {len(mods)} multimodal rows -> {out}")


if __name__ == "__main__":
    gen_ivf(sys.argv[1], sys.argv[2], sys.argv[4])
    gen_multimodal(sys.argv[1], sys.argv[3])
