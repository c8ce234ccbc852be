#!/usr/bin/env python3
"""Embeddings-only decade scaling, for trainer/ANN slope evidence where the
other tables are dead weight (gen_scale.py replicates the whole schema —
60M lineitem rows nobody reads in a kmeans slope run).

Same construction as gen_scale.py's embeddings arm — per-replica
deterministic md5 sign-flip (identity for replica 0), norm-preserving,
near-zero cross-replica cosine at any factor; vec_ids offset by
stride = max(vec_id)+1 per replica — but under a DIFFERENT salt
("emb2:" vs gen_scale.py's "emb:"): when the source corpus was itself
sign-flip scaled, reusing the same pattern family makes replica (k, j)
and (j, k) compose to IDENTICAL vectors (s_k * s_j == s_j * s_k), which
manufactures factor^2/2 exact-duplicate pairs per source vector instead
of a clean 10x corpus. Independent salts keep every composed pattern
distinct.

Usage: python3 tools/gen_scale_embeddings.py [src_dir] [dst_dir] [factor]
"""
import hashlib
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf10_emb"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
con.execute("SET threads TO 16")
con.execute(f"CREATE TEMP TABLE ks AS SELECT unnest(range({FACTOR})) AS k")


def sign_list(k, dim):
    signs = []
    for i in range(dim):
        h = hashlib.md5(f"emb2:{k}:{i}".encode()).hexdigest()
        signs.append(1.0 if h[0] >= "8" else -1.0)
    return "[" + ", ".join(str(s) for s in signs) + "]"


v_str = con.execute(
    f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
).fetchone()[0]
emb_dim = con.execute(
    f"SELECT max(len(embedding)) FROM read_parquet('{SRC}/embeddings.parquet')"
).fetchone()[0]
whens = ["WHEN k = 0 THEN embedding"] + [
    f"WHEN k = {k} THEN list_transform(generate_series(1, len(embedding)), "
    f"i -> CAST(embedding[i] * ({sign_list(k, emb_dim)})[i] AS FLOAT))"
    for k in range(1, FACTOR)
]

import os

os.makedirs(DST, exist_ok=True)
con.execute(f"""
    COPY (SELECT vec_id + k * {v_str} AS vec_id,
                 CASE {' '.join(whens)} END AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), ks)
    TO '{DST}/embeddings.parquet' (FORMAT parquet, COMPRESSION uncompressed)
""")
n = con.execute(
    f"SELECT count(*), count(DISTINCT vec_id) FROM read_parquet('{DST}/embeddings.parquet')"
).fetchone()
print(f"wrote {DST}/embeddings.parquet rows={n[0]} distinct_ids={n[1]}")
