#!/usr/bin/env python3
"""DuckDB-side bench twin: times every oracle SQL so the Spark/DuckDB
throughput ratio is auditable from repo artifacts alone.

Usage: python3 tools/bench_duckdb.py [sfDir] [oracleDir] [outFile]

oracleDir is a graft.Verify output dir holding oracle_sql.json. Each
query runs twice (min-of-two, mirroring graft.Bench) with results
fetched fully. Writes {"metric","value","unit","threads","queries","sf"}
to outFile (default BENCH_DUCKDB.json).
"""
import json
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
OUT = sys.argv[3] if len(sys.argv) > 3 else "BENCH_DUCKDB.json"
THREADS = 32

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.execute(f"SET threads = {THREADS}")
# same spill hygiene as tools/check.py: big-SF oracle sorts must spill
# to disk, not get OS-OOM-killed (cap ~75% of physical RAM, DuckDB's
# own default policy; GRAFT_DUCKDB_MEM overrides)
import os
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
_mem = os.environ.get("GRAFT_DUCKDB_MEM")
if _mem is None:
    _ram_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 2**30
    _mem = f"{max(1, int(_ram_gb * 0.75))}GB"
con.execute(f"SET memory_limit='{_mem}'")
for t in TABLES:
    # driver testdata is a single parquet FILE per table; Spark-written
    # scale shards (e.g. /tmp/sfbig) are parquet DIRECTORIES
    import os
    path = f"{SF}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{ORACLE_DIR}/oracle_sql.json"))


def time_once(sql):
    t0 = time.monotonic()
    con.execute(sql).fetchall()
    return time.monotonic() - t0


results = {}
for name in sorted(oracle):
    sql = oracle[name]
    try:
        t = min(time_once(sql), time_once(sql))
    except Exception as e:  # noqa: BLE001 - record the failure, keep going
        print(f"[bench_duckdb] {name} FAILED: {e}", file=sys.stderr)
        t = -1.0
    results[name] = t
    print(f"{name}: {t:.3f}s")

total = sum(v for v in results.values() if v >= 0)
out = {"metric": "total", "value": total, "unit": "sec", "threads": THREADS,
       "queries": results, "sf": SF}
with open(OUT, "w") as fh:
    json.dump(out, fh, indent=None)
    fh.write("\n")
print(f"total: {total:.1f}s -> {OUT}")
