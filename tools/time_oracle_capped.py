#!/usr/bin/env python3
"""Time selected SparkEntry oracle SQLs in DuckDB with a per-query wall cap.

Usage:
  time_oracle_capped.py <sfDir> <oracle_sql.json> <cap_seconds> [q1,q2,...]

Dev-only companion to time_oracle.py for LARGE scale factors, where some
twins (recursive reachability, dedup chains) run for hours: each query
executes in its own subprocess so a cap kill cannot poison the parent
connection, and a capped query reports -cap ("ran >= cap seconds without
finishing") instead of blocking the sweep. Omitting the query list times
every oracle.
"""
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sf_dir, sql, out):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    con.execute(sql).fetchall()
    out.put(time.time() - t0)


def main():
    sf_dir, oracle_path, cap = sys.argv[1], sys.argv[2], float(sys.argv[3])
    oracles = json.loads(Path(oracle_path).read_text())
    names = (sys.argv[4].split(",") if len(sys.argv) > 4
             else sorted(oracles.keys()))
    unknown = [n for n in names if n not in oracles]
    if unknown:
        sys.exit(f"unknown oracle keys: {', '.join(unknown)}")
    timings = {}
    for name in names:
        q = mp.Queue()
        proc = mp.Process(target=run_one, args=(sf_dir, oracles[name], q))
        proc.start()
        proc.join(timeout=cap)
        if proc.is_alive():
            proc.terminate()
            proc.join()
            timings[name] = -cap
            print(f"CAPPED {name}: >= {cap}s", file=sys.stderr)
        elif not q.empty():
            timings[name] = q.get()
        else:
            timings[name] = -1.0
            print(f"ERROR {name} (exit {proc.exitcode})", file=sys.stderr)
    finished = sum(v for v in timings.values() if v >= 0)
    print(json.dumps({"metric": "duckdb_capped", "finished_total": finished,
                      "cap_sec": cap, "queries": timings, "sf": sf_dir}))


if __name__ == "__main__":
    main()
