#!/usr/bin/env python3
"""Independent-implementation fixture for dedup_clusters: reuses the
from-scratch Python shingle/minhash/guard/Jaccard replicas in
gen_dedup_fixtures.py, filters verified pairs at jaccard >= 0.8, and runs a
plain UNION-FIND (not label propagation — a different algorithm than the
engine's, so agreement checks the RESULT, not the implementation), writing
one row per cluster: (cluster_rep = min doc_id, size), ordered.

Usage: gen_cluster_fixture.py <sfDir> <out_parquet>
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import gen_dedup_fixtures as g


def main(sf_dir, out):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    docs = {int(i): t for i, t in rows}
    wsh = {i: g.word_shingles(t, 3) for i, t in docs.items()}
    keys = {i: g.minhash_band_keys(s, 32, 8) for i, s in wsh.items()}
    pairs = [(a, b) for a, b in g.guarded_pairs(keys)
             if g.jaccard(wsh[a], wsh[b]) >= 0.8]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    clusters = {}
    for node in parent:
        clusters.setdefault(find(node), []).append(node)
    reps = sorted(clusters)
    pq.write_table(pa.table({
        "cluster_rep": pa.array(reps, pa.int64()),
        "size": pa.array([len(clusters[r]) for r in reps], pa.int64()),
    }), out)
    print(f"wrote {len(reps)} clusters covering "
          f"{sum(len(v) for v in clusters.values())} docs to {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
