#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: tools/check.py SF_DIR OUT_DIR [query ...]

Loads OUT_DIR/<name> parquet (written by graft.Verify), runs the matching
oracle SQL from OUT_DIR/oracle_sql.json in DuckDB with views named after the
fixture tables in SF_DIR, sorts columns by name (like the driver), and
compares shapes + values exactly. Reports per-query PASS/FAIL with diffs.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        marker = f"{out_dir}/{name}._FAILED"
        if os.path.exists(marker):
            msg = open(marker).read().strip().splitlines()
            print(f"FAIL {name}: query threw: {msg[0] if msg else '?'}")
            n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            # hive_partitioning=0: an arg-spec output dir ('name@key=val')
            # would otherwise be inferred as a hive partition column
            got = norm(con.sql(f"SELECT * FROM read_parquet({files!r}, hive_partitioning=0)").df())
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape spark={got.shape} oracle={want.shape}")
            print("  spark cols:", list(got.columns), " oracle cols:", list(want.columns))
            n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(want.columns)}")
            n_fail += 1; continue
        bad = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                # the driver's hash compare is TYPE-sensitive: an int64
                # Spark column vs a HUGEINT-(→float64) oracle column fails
                # there even when values match, so flag dtype-kind
                # divergence instead of silently coercing it away
                if a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} <= {'i', 'u', 'f'}:
                    bad.append(f"{c}: dtype mismatch spark={a.dtype} oracle={b.dtype} "
                               "(driver hash compare would fail)")
                    continue
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    ae = a.astype(float); be = b.astype(float)
                    neq = ~((ae == be) | (ae.isna() & be.isna()))
                    if neq.any():
                        mad = (ae - be).abs().max()
                        bad.append(f"{c}: {int(neq.sum())} diffs (max abs {mad})")
                else:
                    av, bv = a.astype(object), b.astype(object)
                    neq = ~((av == bv) | (av.isna() & bv.isna()))
                    if neq.any():
                        i = int(neq[neq].index[0])
                        bad.append(f"{c}: {int(neq.sum())} diffs, first@{i}: spark={av[i]!r} oracle={bv[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({got.shape[0]} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
