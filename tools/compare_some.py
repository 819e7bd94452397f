#!/usr/bin/env python3
"""Name-filtered differential: tools/compare.py restricted to a
comma-separated query subset — the per-query dev loop companion of
`runMain graft.Verify <sfDir> <outDir> q1,q2`.

Usage: python3 tools/compare_some.py <sfDir> <verifyOutDir> q1[,q2...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare


def main(sf_dir: str, out_dir: str, names: str) -> int:
    keep = set(names.split(","))
    path = f"{out_dir}/oracle_sql.json"
    oracle = {k: v for k, v in json.load(open(path)).items() if k in keep}
    missing = keep - set(oracle)
    if missing:
        print(f"WARN: no oracle for {sorted(missing)}")
    # pass the subset in memory — never rewrite oracle_sql.json in place
    # (a later full compare.py on the same outDir must see the full set)
    return compare.main(sf_dir, out_dir, oracle=oracle)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
