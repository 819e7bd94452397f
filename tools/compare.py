#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the testdata parquet tables and compares
against the engine's parquet dumps produced by graft.Verify.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) is not None else df[c]
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def main(sf_dir: str, out_dir: str, oracle: dict = None) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    if oracle is None:
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = con.execute(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
            e, g = norm(expected), norm(got)
            if list(e.columns) != list(g.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if [str(t) for t in e.dtypes] != [str(t) for t in g.dtypes]:
                print(f"WARN {name}: dtypes {list(map(str, g.dtypes))} != {list(map(str, e.dtypes))}")
            if len(e) != len(g):
                print(f"FAIL {name}: rows {len(g)} != {len(e)}")
                n_fail += 1
                continue
            eq = e.reset_index(drop=True).eq(g.reset_index(drop=True)) | (
                e.reset_index(drop=True).isna() & g.reset_index(drop=True).isna())
            if not bool(eq.all().all()):
                bad = [c for c in e.columns if not bool(eq[c].all())]
                idx = (~eq.all(axis=1)).idxmax()
                print(f"FAIL {name}: value mismatch cols={bad} first_row={idx}")
                print("  expected:", e.iloc[idx].to_dict())
                print("  got     :", g.iloc[idx].to_dict())
                n_fail += 1
                continue
            print(f"PASS {name} ({len(e)} rows)")
            n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total oracled")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
