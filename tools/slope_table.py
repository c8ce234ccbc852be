#!/usr/bin/env python3
"""Per-query scale-slope table: join Spark bench + DuckDB oracle timings
at two scale factors and flag rows whose runtime slope exceeds the data
growth factor.

Usage:
  python3 tools/slope_table.py <spark_small.json> <spark_big.json> \
      <duck_small.json> <duck_big.json> <factor> [min_big_sec]

Inputs: the per-query JSON lines Bench writes (first line of
SPARK_GRAFT_BENCH_OUT) and time_oracle.py's stdout JSON. Rows with
big-SF Spark time below min_big_sec (default 1.0 s) are slope-checked
but not flagged — sub-second rows are harness-noise-dominated.
Emits a markdown table sorted by Spark big-SF time desc, then a summary
line naming flagged rows.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "queries" in d:
                return {k: v for k, v in d["queries"].items() if v >= 0}
    raise SystemExit(f"no per-query map in {path}")


def main():
    ss, sb, ds, db = (load(p) for p in sys.argv[1:5])
    factor = float(sys.argv[5])
    min_big = float(sys.argv[6]) if len(sys.argv) > 6 else 1.0
    names = sorted(set(ss) & set(sb) & set(ds) & set(db),
                   key=lambda n: -sb[n])
    flagged = []
    print("| query | spark s (small) | spark s (big) | slope | "
          "duckdb s (small) | duckdb s (big) | duck slope |")
    print("|---|---|---|---|---|---|---|")
    for n in names:
        slope = sb[n] / ss[n] if ss[n] > 0 else float("inf")
        dslope = db[n] / ds[n] if ds[n] > 0 else float("inf")
        mark = ""
        if sb[n] >= min_big and slope > factor * 1.5:
            flagged.append((n, slope))
            mark = " **(!)**"
        print(f"| {n}{mark} | {ss[n]:.2f} | {sb[n]:.2f} | {slope:.1f}x | "
              f"{ds[n]:.2f} | {db[n]:.2f} | {dslope:.1f}x |")
    tot_ss = sum(ss[n] for n in names)
    tot_sb = sum(sb[n] for n in names)
    tot_ds = sum(ds[n] for n in names)
    tot_db = sum(db[n] for n in names)
    print(f"\nTOTALS: spark {tot_ss:.1f} -> {tot_sb:.1f} s "
          f"({tot_sb / tot_ss:.2f}x), duckdb {tot_ds:.1f} -> {tot_db:.1f} s "
          f"({tot_db / tot_ds:.2f}x), data factor {factor:g}, "
          f"ratio at big SF {tot_sb / tot_db:.3f}x")
    if flagged:
        print(f"FLAGGED (slope > {factor * 1.5:g}x and >= {min_big:g}s): " +
              ", ".join(f"{n} ({s:.1f}x)" for n, s in sorted(
                  flagged, key=lambda x: -x[1])))
    else:
        print(f"FLAGGED: none (no row >= {min_big:g}s exceeds "
              f"{factor * 1.5:g}x)")


if __name__ == "__main__":
    main()
