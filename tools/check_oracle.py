#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, load the Verify parquet output,
sort columns by name + rows by value, and compare cell-by-cell.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        if v == int(v) and abs(v) < 1e15:  # int-valued: match int repr
            return (str(int(v)),)
        return (f"{v:.10g}",)
    return (str(v),)

def key(row):
    return tuple(x for c in row for x in norm(c))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
            got = got.reindex(sorted(got.columns), axis=1)
            want = want.reindex(sorted(want.columns), axis=1)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} "
                      f"vs oracle {list(want.columns)}")
                n_bad += 1
                continue
            g = sorted([key(r) for r in got.itertuples(index=False)])
            w = sorted([key(r) for r in want.itertuples(index=False)])
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs oracle {len(w)}")
                n_bad += 1
                continue
            bad = [(a, b) for a, b in zip(g, w) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} mismatched rows; "
                      f"first: {bad[0][0]} vs {bad[0][1]}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(g)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
