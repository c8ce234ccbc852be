#!/usr/bin/env python3
"""Embeddings-only decade scaling, for trainer/ANN slope evidence where the
other tables are dead weight (gen_scale.py replicates the whole schema —
60M lineitem rows nobody reads in a kmeans slope run).

Same construction as gen_scale.py's embeddings arm — per-replica
deterministic md5 sign-flip (identity for replica 0), norm-preserving,
near-zero cross-replica cosine at any factor; vec_ids offset by
stride = max(vec_id)+1 per replica — but under a DIFFERENT salt
(generation-depth-derived, "emb2:" for a first-generation scale, vs
gen_scale.py's "emb:"): when the source corpus was itself sign-flip
scaled, reusing the same pattern family makes replica (k, j) and (j, k)
compose to IDENTICAL vectors (s_k * s_j == s_j * s_k), which
manufactures factor^2/2 exact-duplicate pairs per source vector instead
of a clean 10x corpus. Independent salts keep every composed pattern
distinct.

The same trap recurs one level up if THIS tool is chained on its own
output (sf1 -> sf10_emb -> sf100): a fixed "emb2:" salt would commute
with itself. Guard: each run writes `_scale_meta.json` (generation
depth) into dst, reads it back from src if present, and salts with
`emb{depth+1}:` — so every generation gets a fresh, non-commuting
pattern family automatically. Depth 1 (scaling an unscaled base corpus)
keeps the exact "emb2:" patterns earlier rounds' corpora were built
with.

Usage: python3 tools/gen_scale_embeddings.py [src_dir] [dst_dir] [factor]
"""
import hashlib
import json
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf10_emb"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# Depth is PER MUTATION FAMILY: this tool's sign-flip generations count
# under "emb_scale_depth", independent of gen_scale.py's "depth" (its
# caesar/suffix + 'emb:'-salted families). Cross-tool chaining is safe —
# the salt families are disjoint strings, so their md5 patterns never
# commute; only same-family chaining needs the escalating counter. The
# legacy "scale_depth" key (early round-9 runs) is read for compatibility.
src_meta = os.path.join(SRC, "_scale_meta.json")
SRC_META = {}
if os.path.exists(src_meta):
    with open(src_meta) as f:
        SRC_META = json.load(f)
src_depth = SRC_META.get("emb_scale_depth", SRC_META.get("scale_depth", 0))
DEPTH = src_depth + 1
SALT = f"emb{DEPTH + 1}"
print(f"src scale_depth={src_depth} -> salt '{SALT}:'")

con = duckdb.connect()
con.execute("SET threads TO 16")
con.execute(f"CREATE TEMP TABLE ks AS SELECT unnest(range({FACTOR})) AS k")


def sign_list(k, dim):
    signs = []
    for i in range(dim):
        h = hashlib.md5(f"{SALT}:{k}:{i}".encode()).hexdigest()
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

os.makedirs(DST, exist_ok=True)
with open(os.path.join(DST, "_scale_meta.json"), "w") as f:
    json.dump({**SRC_META, "emb_scale_depth": DEPTH, "emb_salt": SALT,
               "emb_factor": FACTOR, "emb_src": SRC}, f)
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
