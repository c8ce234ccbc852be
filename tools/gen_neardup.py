#!/usr/bin/env python3
"""Plant TRUE near-duplicate pairs into an embeddings table so the
production operating point of `cosineNearDupPairsBanded` (t >= 0.9) can
be MEASURED instead of model-priced (round-7 verdict, "What's missing"
#1: the synthetic corpus has no pairs above cos 0.9 at all, so banded
recall at the near-dup threshold rested on the validated SRP model).

For every `stride`-th vector v a perturbed twin v' is emitted with an
EXACT target cosine: v' = |v| * (v_hat * cos(theta) + g_hat * sin(theta))
where g_hat is the unit component of a deterministic md5-derived +-1
pattern orthogonal to v, and cos(theta) is drawn deterministically per
vector from [cos_lo, cos_hi]. Norm-preserving, fully reproducible (no
RNG state), and the planted cosine is known analytically per pair.

Twin ids are `vec_id + id_stride` (max id + 1), so the planted set is
`(vec_id, vec_id + id_stride)` for every sampled vec_id — written out
as planted_pairs.parquet beside the embeddings.

Usage: python3 tools/gen_neardup.py <src_embeddings.parquet> <dst_dir>
                                    [stride] [cos_lo] [cos_hi]
"""
import hashlib
import math
import pathlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1/embeddings.parquet"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf1_neardup"
STRIDE = int(sys.argv[3]) if len(sys.argv) > 3 else 10
COS_LO = float(sys.argv[4]) if len(sys.argv) > 4 else 0.90
COS_HI = float(sys.argv[5]) if len(sys.argv) > 5 else 0.98

tbl = pq.read_table(SRC)
vec_ids = tbl.column("vec_id").to_numpy()
embs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
labels = tbl.column("label").to_pylist()
n, dim = embs.shape
id_stride = int(vec_ids.max()) + 1

def sign_pattern(vid, dim):
    """Deterministic +-1 pattern, namespaced away from the engine's SRP
    planes ("plant:" prefix) so planted noise is independent of the
    hash family that buckets it."""
    return np.array([
        1.0 if hashlib.md5(f"plant:{vid}:{i}".encode()).hexdigest()[0] >= "8"
        else -1.0
        for i in range(dim)])

def target_cos(vid):
    """Deterministic draw in [COS_LO, COS_HI] from md5(vid)."""
    h = int(hashlib.md5(f"plantcos:{vid}".encode()).hexdigest()[:8], 16)
    return COS_LO + (COS_HI - COS_LO) * (h / 0xFFFFFFFF)

dup_ids, dup_vecs, dup_labels, pair_rows = [], [], [], []
for idx in range(0, n, STRIDE):
    vid = int(vec_ids[idx])
    v = embs[idx]
    nv = np.linalg.norm(v)
    if nv == 0:
        continue
    v_hat = v / nv
    p = sign_pattern(vid, dim)
    g = p - (p @ v_hat) * v_hat
    ng = np.linalg.norm(g)
    if ng < 1e-9:
        continue  # pattern parallel to v (measure-zero; skip)
    g_hat = g / ng
    c = target_cos(vid)
    v2 = nv * (v_hat * c + g_hat * math.sqrt(1.0 - c * c))
    # floats are what the engine sees — the float-rounded cosine may land
    # an ulp either side of the target; the measurement recomputes the
    # exact float cosine engine-side before thresholding.
    dup_ids.append(vid + id_stride)
    dup_vecs.append(v2.astype(np.float32))
    dup_labels.append(labels[idx])
    pair_rows.append((vid, vid + id_stride, c))

out_ids = np.concatenate([vec_ids, np.array(dup_ids, dtype=vec_ids.dtype)])
out_vecs = [np.asarray(e, dtype=np.float32) for e in embs] + dup_vecs
out_labels = labels + dup_labels

pathlib.Path(DST).mkdir(parents=True, exist_ok=True)
emb_type = pa.list_(pa.float32())
out = pa.table({
    "vec_id": pa.array(out_ids.tolist(), type=tbl.schema.field("vec_id").type),
    "embedding": pa.array([v.tolist() for v in out_vecs], type=emb_type),
    "label": pa.array(out_labels, type=tbl.schema.field("label").type),
})
pq.write_table(out, f"{DST}/embeddings.parquet", compression="snappy")
pairs = pa.table({
    "id_a": pa.array([r[0] for r in pair_rows], type=pa.int64()),
    "id_b": pa.array([r[1] for r in pair_rows], type=pa.int64()),
    "target_cos": pa.array([r[2] for r in pair_rows], type=pa.float64()),
})
pq.write_table(pairs, f"{DST}/planted_pairs.parquet", compression="snappy")
print(f"planted {len(pair_rows)} twins over {n} vectors -> {DST} "
      f"(cos in [{COS_LO}, {COS_HI}], id_stride={id_stride})")
