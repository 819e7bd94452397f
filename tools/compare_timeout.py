#!/usr/bin/env python3
"""sf0.1 differential with a per-oracle timeout: each oracle runs in a
child process; timeouts are reported as EXCLUDED (quadratic oracle), not
failures. Usage: compare_timeout.py <sfDir> <outDir> [timeoutSec]"""
import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sf_dir, out_dir, name, sql, q):
    import duckdb
    import pandas as pd
    from compare import norm
    try:
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        e = norm(con.execute(sql).df())
        g = norm(pd.read_parquet(f"{out_dir}/{name}"))
        if len(e) != len(g):
            q.put((name, f"FAIL rows {len(e)} != {len(g)}")); return
        if sorted(e.columns) != sorted(g.columns):
            q.put((name, f"FAIL cols {sorted(e.columns)} != {sorted(g.columns)}")); return
        if e.astype(str).values.tolist() != g.astype(str).values.tolist():
            q.put((name, "FAIL value mismatch")); return
        q.put((name, f"PASS ({len(g)} rows)"))
    except Exception as ex:
        q.put((name, f"FAIL {type(ex).__name__}: {ex}"))


def main(sf_dir, out_dir, timeout):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"MISSING {name}"); n_fail += 1; continue
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, out_dir, name, sql, q))
        p.start(); p.join(timeout)
        if p.is_alive():
            p.terminate(); p.join()
            print(f"EXCLUDED {name} (oracle > {timeout}s)"); n_skip += 1
        else:
            _, msg = q.get()
            print(f"{msg.split()[0]} {name}" + (" " + " ".join(msg.split()[1:]) if len(msg.split()) > 1 else ""))
            if msg.startswith("PASS"):
                n_pass += 1
            else:
                n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} excluded "
          f"of {len(oracle)} oracled")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 180))
