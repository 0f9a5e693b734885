#!/usr/bin/env python3
"""Time individual oracle SQL statements from a Verify dump in DuckDB.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> <query> [...]
Prints seconds per query (execution only, result fetched).
"""
import duckdb, sys, json, glob, os, time

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    for name in names:
        con = duckdb.connect()
        for p in glob.glob(f"{sfdir}/*.parquet"):
            t = os.path.basename(p)[:-8]
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        t0 = time.time()
        df = con.sql(oracle[name]).df()
        print(f"{name}: {time.time()-t0:.1f}s ({len(df)} rows)", flush=True)
        con.close()

if __name__ == "__main__":
    main()
