#!/usr/bin/env python3
"""Local reproduction of the driver's correctness gate (dev tool only —
NOT part of the library; the Scala code never depends on this).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 target/verify_out"
  python3 tools/gate.py target/verify_out /root/testdata/sf0.01 [query ...]

Mimics the driver: run each oracle SQL in DuckDB over the sf parquet
tables, sort columns by name, sort rows, compare values + dtypes against
the Spark parquet dump. Queries without oracle SQL are rows-only.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver-compare emulation: cells are stringified before hashing, so
    # int width is invisible (int32 "5" == int64 "5") but float-vs-int is
    # NOT ("5.000000" != "5"); floats observed at ~6 dp
    for c in df.columns:
        if str(df[c].dtype) in ("int8", "int16", "int32", "uint32"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "float64":
            df[c] = df[c].round(6) + 0.0  # -0.0 -> 0.0
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # probe-scale corpora (the 500k-doc sf10 gate) push the gram-space
    # oracles past duckdb's default memory limit; its disk spill for one
    # such query exceeded the whole /tmp volume (measured r16: q102
    # filled 74 GB and died ENOSPC). A high explicit limit keeps the
    # intermediates in RAM on the 125 GB gate host.
    ml = os.environ.get("GRAFT_GATE_MEMLIMIT")
    if ml:
        con.execute(f"SET memory_limit='{ml}'")
        # row order is irrelevant here (norm() sorts); preserving
        # insertion order forces duckdb to MATERIALIZE wide lateral
        # intermediates (the gram-space oracles carry the token list per
        # exploded row) instead of streaming them — the difference
        # between a pipelined aggregate and a 70 GB spill at 500k docs
        con.execute("SET preserve_insertion_order=false")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        # a corpus table may be a single parquet file (driver testdata,
        # duckdb-derived corpora) or a Spark-written DIRECTORY of part
        # files (graft.ScaleCorpus) — read both
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        if only and name not in only:
            continue
        spark = norm(con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
        if name not in oracles:
            print(f"{name}: rows-only spark_rows={len(spark)}")
            continue
        oracle = norm(con.execute(oracles[name]).df())
        rows = len(spark) == len(oracle)
        schema = list(spark.columns) == list(oracle.columns)
        dtypes = schema and all(
            str(spark[c].dtype) == str(oracle[c].dtype) for c in spark.columns)
        # driver hashes stringified cells; float forms matter, so compare
        # the pandas frames exactly (dtype + values)
        match = rows and schema and dtypes and spark.equals(oracle)
        status = "OK" if match else "MISMATCH"
        if not match:
            bad += 1
            detail = (f" rows={len(spark)}/{len(oracle)} cols_eq={schema}"
                      f" dtypes_eq={dtypes}")
            if schema and not dtypes:
                for c in spark.columns:
                    if str(spark[c].dtype) != str(oracle[c].dtype):
                        detail += f" [{c}: {spark[c].dtype} vs {oracle[c].dtype}]"
            elif rows and schema and dtypes:
                neq = (spark != oracle) & ~(spark.isna() & oracle.isna())
                cols = [c for c in spark.columns if neq[c].any()]
                detail += f" diff_cols={cols[:4]}"
            print(f"{name}: {status}{detail}")
        else:
            print(f"{name}: OK ({len(spark)} rows)")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
