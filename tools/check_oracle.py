#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
sf-dir parquet tables and compares with the Spark result parquet written
by graft.Verify. Mimics the driver: columns sorted by name, then rows
sorted, then values compared exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import duckdb, sys, json, glob, os

def norm_df(df):
    df = df[sorted(df.columns)]
    # stringify every cell so lists/decimals/timestamps sort & compare
    df = df.map(lambda v: repr(v))
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            nfail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns spark={gcols} oracle={ecols}")
            nfail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            nfail += 1
            continue
        g, e = norm_df(got), norm_df(exp)
        if g.equals(e):
            print(f"PASS {name} ({len(got)} rows)")
            npass += 1
        else:
            neq = (g != e)
            bad_cols = [c for c in g.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"  {c}[{idx}]: spark={g[c][idx]} oracle={e[c][idx]}")
            nfail += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
