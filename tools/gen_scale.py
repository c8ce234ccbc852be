#!/usr/bin/env python3
"""Scale the driver's sf0.1 testdata up by an integer factor (default 10×
→ "sf1": ~6M lineitem, ~50k documents) for perf evidence one decade above
the driver's bench SF. Dev-only tool; output lives under the repo (the
driver's /root/testdata is read-only) and is .gitignored.

Usage: python3 tools/gen_scale.py [src_dir] [dst_dir] [factor] [mutation]

mutation = caesar (default; letter rotation, only sound for factor <= 26)
         | suffix (append the replica number to every word — sound at any
           factor; used for the sf10 slope evidence where caesar shifts
           would collide mod 26 and manufacture cross-replica near-dups)

Replication is key-consistent and workload-preserving:
  - every key space gets a per-replica offset of `stride = max(key)+1`,
    applied to BOTH sides of each FK edge (lineitem→orders/part/supplier,
    orders→customer, events→user), so join fan-outs scale linearly;
  - document text gets a per-replica Caesar shift (letters only): lengths,
    token boundaries and within-replica duplicate structure are preserved,
    but replicas share no shingles — otherwise every doc would acquire
    factor-1 exact twins and the dedup suite would measure a pathological
    all-near-dup corpus instead of a 10× version of the same one;
  - embeddings get a per-replica deterministic sign-flip pattern
    (md5-derived, identity for replica 0): norm-preserving, near-zero
    cross-replica cosine for every pair of replicas at ANY factor (a
    cyclic rotation would repeat mod the vector dim and hand factor>dim
    replicas identical vectors);
  - region/nation stay fixed (TPC-H dimensions do not scale with SF).
"""
import os
import json
import pathlib
import string
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
MUTATION = sys.argv[4] if len(sys.argv) > 4 else "caesar"
assert MUTATION in ("caesar", "suffix", "suffix_stop")
assert MUTATION != "caesar" or FACTOR <= 26, "caesar collides beyond 26 replicas"

# Generation depth: chaining this tool on its own output must not reuse a
# mutation family whose per-replica patterns COMMUTE across generations —
# caesar shifts compose additively (replica (j,k) of a chained run equals
# any (j',k') with j+k = j'+k', i.e. ~FACTOR² manufactured exact-twin
# groups per base doc: ENOSPC'd the round-9 sf10 dedup bench before it was
# caught), and the md5 sign-flip patterns multiply commutatively the same
# way (the gen_scale_embeddings.py bug fixed in round 9). Depth rides a
# _scale_meta.json beside the parquet; absent (the driver's pristine
# testdata) means depth 0.
_meta = pathlib.Path(SRC) / "_scale_meta.json"
SRC_META = json.loads(_meta.read_text()) if _meta.exists() else {}
SRC_DEPTH = SRC_META.get("depth", 0)
if MUTATION == "caesar" and SRC_DEPTH >= 1:
    sys.exit(
        f"{SRC} is already a generation-{SRC_DEPTH} scale-up: caesar shifts "
        "compose additively across generations and manufacture exact-twin "
        "replicas — rerun with mutation=suffix (sound when chained at "
        "factor <= 10: appended digit strings decode uniquely)")
# Missing meta only proves pristine provenance for the driver's own
# testdata; a pre-meta-era scale-up (or any corpus of unknown lineage)
# would read as depth 0 and silently re-enable the caesar chain.
if (MUTATION == "caesar" and not _meta.exists()
        and not SRC.rstrip("/").startswith("/root/testdata/")
        and not os.environ.get("GEN_SCALE_TRUST_PRISTINE")):
    sys.exit(
        f"{SRC} has no _scale_meta.json and is not the driver's pristine "
        "testdata — provenance unknown, so caesar chaining cannot be ruled "
        "out. Use mutation=suffix, or rerun with "
        "GEN_SCALE_TRUST_PRISTINE=1 if the corpus is known unscaled.")
assert MUTATION == "caesar" or SRC_DEPTH == 0 or FACTOR <= 10, \
    "chained suffix replicas need factor <= 10 for unambiguous digit strings"

con = duckdb.connect()
con.execute("SET threads TO 16")
con.execute(f"CREATE TEMP TABLE ks AS SELECT unnest(range({FACTOR})) AS k")

def stride(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]

o_str = stride("orders", "o_orderkey")
c_str = stride("customer", "c_custkey")
p_str = stride("part", "p_partkey")
s_str = stride("supplier", "s_suppkey")
e_str = stride("events", "event_id")
u_str = stride("events", "user_id")
d_str = stride("documents", "doc_id")
v_str = stride("embeddings", "vec_id")

def caesar_case(col):
    """Per-replica letter rotation as a CASE over k (duckdb translate)."""
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    whens = []
    for k in range(FACTOR):
        r = k % 26
        shifted = lo[r:] + lo[:r] + up[r:] + up[:r]
        whens.append(f"WHEN k = {k} THEN translate({col}, '{lo}{up}', '{shifted}')")
    return "CASE " + " ".join(whens) + " END"


def mutate(col):
    """Per-replica text mutation: replicas must share no word shingles so
    the scaled corpus is N× the same near-dup workload, never an
    all-twins pathology. `suffix` appends the replica number to every
    word (token structure, counts and within-replica duplicate identity
    preserved; vocabularies disjoint at any factor). `suffix_stop` is
    `suffix` with the bare word 'the' RESTORED afterwards: both plain
    mutations destroy every stopword, which guts stopword-gated
    operators (the gopher keep rule keeps ZERO suffix-replica docs —
    measured, SCALE.md round 13) and makes funnel slopes unmeasurable;
    restoring only 'the' keeps those gates alive while cross-replica
    3-gram shingles can only collide through a 3-token window made
    entirely of RESTORE-INVARIANT tokens ('the' in any casing, or a
    token with no ASCII letters at all — digits/punctuation are never
    suffixed). The guard below VERIFIES the source corpus has no such
    window (and no all-invariant short doc, which would collapse to
    byte-identical replicas = manufactured exact dups) instead of
    assuming it. The restore is case-insensitive ('The<k>'/'THE<k>'
    restore too, capture group preserves the original casing) and the
    pattern requires a word boundary after the digits, so an original
    token like 'the7' — suffixed to 'the<k>7' — is never falsely
    restored."""
    if MUTATION == "caesar":
        return caesar_case(col)
    suffixed = (f"regexp_replace({col}, '([A-Za-z]+)', "
                "'\\1' || CAST(k AS VARCHAR), 'g')")
    if MUTATION == "suffix":
        return suffixed
    return (f"regexp_replace({suffixed}, "
            "'\\b(the)' || CAST(k AS VARCHAR) || '\\b', '\\1', 'gi')")


def check_suffix_stop_source():
    """suffix_stop's no-manufactured-near-dups property, MEASURED on the
    source corpus rather than claimed: a cross-replica shared 3-token
    shingle (or a byte-identical replica of a whole doc) requires
    restore-invariant tokens — lower(t) = 'the', or a token containing
    no ASCII letter. Real corpora DO contain the odd literal
    'the the the' run (sf0.001 doc 295; 3 docs at sf0.1), so this is a
    measured bound, not a zero assert: each flagged doc manufactures at
    most one C(FACTOR,2) replica pair family (its replicas share ONLY
    the invariant windows — still near-dup candidates, not exact dups,
    unless the whole doc is invariant). Fail only when the flagged
    fraction is material (> 0.1%); otherwise print the count so slope
    evidence can state the manufactured-pair bound explicitly."""
    bad, total = con.execute(f"""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ts
        FROM read_parquet('{SRC}/documents.parquet')),
      inv AS (
        SELECT doc_id, len(ts) AS n,
               list_transform(ts, t ->
                 lower(t) = 'the' OR NOT regexp_matches(t, '[A-Za-z]')) AS iv
        FROM toks)
      SELECT count(*) FILTER (
        (n > 0 AND n <= 3 AND list_reduce(iv, (a, b) -> a AND b))
        OR (n >= 3 AND len(list_filter(generate_series(1, n - 2),
              i -> iv[i] AND iv[i + 1] AND iv[i + 2])) > 0)), count(*)
      FROM inv
    """).fetchone()
    assert bad <= max(1, total // 1000), (
        f"suffix_stop would manufacture cross-replica near-dups at a "
        f"material rate: {bad}/{total} source docs have a 3-token "
        "restore-invariant window — pick a different mutation")
    if bad:
        print(f"suffix_stop note: {bad}/{total} source docs carry a "
              f"restore-invariant 3-token window -> at most {bad} "
              f"manufactured cross-replica candidate-pair families "
              f"(bounded, document in slope evidence)")


if MUTATION == "suffix_stop":
    check_suffix_stop_source()

import pathlib
pathlib.Path(DST).mkdir(parents=True, exist_ok=True)

def copy(table, select):
    con.execute(
        f"COPY ({select}) TO '{DST}/{table}.parquet' "
        f"(FORMAT PARQUET, COMPRESSION SNAPPY)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")

for t in ("region", "nation"):
    copy(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

copy("customer", f"""
  SELECT c_custkey + k * {c_str} AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet'), ks""")

copy("supplier", f"""
  SELECT s_suppkey + k * {s_str} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM read_parquet('{SRC}/supplier.parquet'), ks""")

copy("part", f"""
  SELECT p_partkey + k * {p_str} AS p_partkey, p_name, p_brand, p_type,
         p_retailprice
  FROM read_parquet('{SRC}/part.parquet'), ks""")

copy("orders", f"""
  SELECT o_orderkey + k * {o_str} AS o_orderkey,
         o_custkey + k * {c_str} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet'), ks""")

copy("lineitem", f"""
  SELECT l_orderkey + k * {o_str} AS l_orderkey,
         l_partkey + k * {p_str} AS l_partkey,
         l_suppkey + k * {s_str} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet'), ks""")

copy("events", f"""
  SELECT event_id + k * {e_str} AS event_id, ts,
         user_id + k * {u_str} AS user_id, event_type, value, props
  FROM read_parquet('{SRC}/events.parquet'), ks""")

# caesar is length-preserving so n_chars stays valid; suffix appends the
# replica number to every word, so n_chars must be recomputed from the
# mutated text or profiling/filter queries on it would measure wrong data.
n_chars_expr = (
    "n_chars" if MUTATION == "caesar"
    else f"CAST(length({mutate('text')}) AS INT)")
copy("documents", f"""
  SELECT doc_id + k * {d_str} AS doc_id,
         {mutate('text')} AS text,
         lang, source, {n_chars_expr} AS n_chars
  FROM read_parquet('{SRC}/documents.parquet'), ks""")

import hashlib

def sign_list(k, dim):
    if k == 0:
        return None  # identity — replica 0 is the original
    signs = []
    for i in range(dim):
        # depth-salted: a chained run multiplies a generation-g pattern
        # into a generation-(g-1) one; same-family patterns commute
        # ((j,k) == (k,j) — exact-duplicate vectors), independent families
        # stay independent random signs at any depth. Depth 0 keeps the
        # historical salt so regenerated first-decade corpora stay
        # bit-compatible with every earlier round's evidence.
        salt = f"emb{k}:{i}" if SRC_DEPTH == 0 else f"emb(d{SRC_DEPTH}){k}:{i}"
        h = hashlib.md5(salt.encode()).hexdigest()
        signs.append(1.0 if h[0] >= "8" else -1.0)
    return "[" + ", ".join(str(s) for s in signs) + "]"

emb_dim = con.execute(
    f"SELECT max(len(embedding)) FROM read_parquet('{SRC}/embeddings.parquet')"
).fetchone()[0]
emb_whens = ["WHEN k = 0 THEN embedding"] + [
    f"WHEN k = {k} THEN list_transform(generate_series(1, len(embedding)), "
    f"i -> CAST(embedding[i] * ({sign_list(k, emb_dim)})[i] AS FLOAT))"
    for k in range(1, FACTOR)
]
copy("embeddings", f"""
  SELECT vec_id + k * {v_str} AS vec_id,
         CASE {' '.join(emb_whens)} END AS embedding,
         label
  FROM read_parquet('{SRC}/embeddings.parquet'), ks""")

pathlib.Path(DST, "_scale_meta.json").write_text(
    json.dumps({**SRC_META, "depth": SRC_DEPTH + 1, "mutation": MUTATION,
                "factor": FACTOR, "src": SRC}))
print(f"done: {DST} at {FACTOR}x {SRC} (generation {SRC_DEPTH + 1})")
