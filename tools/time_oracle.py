#!/usr/bin/env python3
"""Time each SparkEntry oracle SQL in DuckDB at a given scale factor.

Usage: python3 tools/time_oracle.py <sfDir> <oracle_sql.json> [threads]

Dev-only: gives the single-node DuckDB cost of the same logical queries, the
de-facto reference-engine baseline to compare BENCH numbers against.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads(Path(oracle_path).read_text())
    timings = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            timings[name] = time.time() - t0
        except Exception as e:
            timings[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
    total = sum(v for v in timings.values() if v >= 0)
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "queries": timings, "sf": sf_dir}))


if __name__ == "__main__":
    main()
