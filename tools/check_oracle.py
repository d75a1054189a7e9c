#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle in DuckDB over the same sf dir, and compares
sorted-by-column-name values row-by-row (floats via repr equality after
rounding is already baked into the queries).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    # an oracle entry whose output dir is absent means Verify's query
    # THREW (it logs and moves on) — that must count as a failure, not
    # silently vanish from the tally
    for name in sorted(set(oracle) - set(names)):
        print(f"FAIL {name}: no Verify output (query threw?)"); n_fail += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: rows={len(got)}")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got_s = got[sorted(got.columns)]
        want_s = want[sorted(want.columns)]
        if list(got_s.columns) != list(want_s.columns):
            print(f"FAIL {name}: columns {list(got_s.columns)} vs {list(want_s.columns)}")
            n_fail += 1; continue
        if len(got_s) != len(want_s):
            print(f"FAIL {name}: rows {len(got_s)} vs {len(want_s)}")
            n_fail += 1; continue
        # compare as value matrices (driver hashes values after col sort)
        import pandas as pd
        gv = got_s.reset_index(drop=True)
        wv = want_s.reset_index(drop=True)
        mismatch = None
        for c in gv.columns:
            a, b = gv[c], wv[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, a[i], b[i], a.dtype, b.dtype)
                break
        if mismatch:
            c, i, av, bv, at, bt = mismatch
            print(f"FAIL {name}: col {c} row {i}: got {av!r}({at}) want {bv!r}({bt})")
            n_fail += 1
        else:
            # dtype drift is worth flagging even when values match
            dt = [(c, str(gv[c].dtype), str(wv[c].dtype))
                  for c in gv.columns if str(gv[c].dtype) != str(wv[c].dtype)]
            note = f" [dtype drift: {dt}]" if dt else ""
            print(f"PASS {name}: rows={len(gv)}{note}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
