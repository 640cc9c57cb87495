#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads each query result parquet written by graft.Verify, runs the
matching oracle SQL in DuckDB over the same tables, and compares:
columns sorted by name, rows sorted by all columns, values compared
exactly (floats via repr). Prints per-query PASS/FAIL.
"""
import json
import sys

import duckdb
# imported eagerly: fetch_arrow_table() below needs it, and a missing
# pyarrow should fail ONCE here with a clear message, not once per query
# inside the compare loop's except
import pyarrow  # noqa: F401

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def connect():
    """Fresh connection with big-SF hygiene: a disk spill directory and
    an explicit memory limit keep large-oracle sorts from OOMing the
    process, and preserve_insertion_order=false lets DuckDB stream
    them (the compare sorts rows itself anyway)."""
    c = duckdb.connect()
    import os
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    # cap at ~75% of PHYSICAL RAM (DuckDB's own default policy) so a
    # smaller host spills to temp_directory instead of getting
    # OS-OOM-killed; GRAFT_DUCKDB_MEM overrides for the big-SF host.
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem is None:
        ram_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 2**30
        mem = f"{max(1, int(ram_gb * 0.75))}GB"
    c.execute(f"SET memory_limit='{mem}'")
    c.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # driver testdata is a single parquet FILE per table;
        # Spark-written scale shards (e.g. /tmp/sfbig) are directories
        path = f"{SF}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return c

con = connect()

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
if len(sys.argv) > 3:  # optional name filter for the local dev loop
    keep = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            elif isinstance(v, list):
                v = json.dumps([repr(x) if isinstance(x, float) else x for x in v])
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        # Type audit: the driver's hasher goes through pandas, where a
        # DuckDB HUGEINT / DECIMAL column converts to float64 and renders
        # "485168.0" where Spark's BIGINT renders "485168" — values that
        # compare equal through fetchall() hash-mismatch on the driver
        # (this was compact_plan's red row in rounds 7-8). Flag any
        # oracle DECIMAL column whose Spark twin is an integer type.
        # KNOWN GAP (not flagged here): an INTEGER oracle column that
        # contains NULLs also converts to float64 through pandas; it only
        # mismatches when the Spark twin's null mask differs, in which
        # case the values differ anyway — but if a red row ever renders
        # "N.0" on ONE side with matching non-null values, suspect an
        # asymmetric null mask on an integer column before anything else.
        osch = con.execute(f"SELECT * FROM ({sql}) _q LIMIT 0").fetch_arrow_table().schema
        ssch = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet' LIMIT 0").fetch_arrow_table().schema
        stypes = {f.name: str(f.type) for f in ssch}
        bad_types = [f.name for f in osch
                     if str(f.type).startswith('decimal')
                     and stypes.get(f.name, '').startswith('int')]
        if bad_types:
            print(f"FAIL {name}: oracle columns {bad_types} are HUGEINT/DECIMAL vs "
                  f"integer on the Spark side (pandas renders them as floats — "
                  f"CAST to BIGINT in the SQL)")
            n_fail += 1
            continue
        got_rel = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        exp_rel = con.execute(sql)
        exp_cols = [d[0] for d in exp_rel.description]
        exp = exp_rel.fetchall()
        g, gc = canon(got, got_cols)
        e, ec = canon(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            n_fail += 1
        elif g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: rows differ ({len(g)} vs {len(e)} rows); first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    except Exception as ex:
        print(f"FAIL {name}: {type(ex).__name__}: {ex}")
        n_fail += 1
        # a query that OOMs DuckDB poisons the connection (every later
        # allocation fails): rebuild it so one heavy oracle cannot
        # cascade into a column of artifact-FAILs
        try:
            con.close()
        except Exception:
            pass
        con = connect()

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
