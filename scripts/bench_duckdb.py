#!/usr/bin/env python3
"""Times each oracle SQL in DuckDB — the reference's actual execution
engine, at its configured parallelism (PRAGMA threads=16,
duckvdb.py:24) — over the same parquet tables, for a single-node
throughput comparison against graft.Bench.

Usage: bench_duckdb.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> None:
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    timings = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = None
            print(f"ERR {name}: {e}", file=sys.stderr)
    total = sum(v for v in timings.values() if v is not None)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "queries": timings, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
