#!/usr/bin/env python3
"""Emulates the driver's DuckDB-oracle compare: for each query in
oracle_sql.json, read the Spark parquet result (file order preserved) and the
DuckDB oracle result, sort columns by name, and compare schema + values
exactly. Run via tools/run_verify.sh."""
import sys, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = sys.argv[3] if len(sys.argv) > 3 and sys.argv[3] else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and not any(tok in name for tok in only.split(",")):
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            orc_df = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = orc_df[sorted(orc_df.columns)]
        errs = []
        if list(s.columns) != list(o.columns):
            errs.append(f"cols spark={list(s.columns)} oracle={list(o.columns)}")
        elif s.shape != o.shape:
            errs.append(f"shape spark={s.shape} oracle={o.shape}")
        else:
            for c in s.columns:
                if str(s[c].dtype) != str(o[c].dtype):
                    errs.append(f"dtype[{c}] spark={s[c].dtype} oracle={o[c].dtype}")
            if not errs:
                neq = (s.values != o.values)
                if neq.any():
                    import numpy as np
                    idx = list(zip(*np.where(neq)))[:5]
                    for (r, ci) in idx:
                        c = s.columns[ci]
                        errs.append(f"row {r} col {c}: spark={s.iloc[r, ci]!r} oracle={o.iloc[r, ci]!r}")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:6]))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(s)} rows)")
            n_ok += 1
    # no-oracle queries: row-count-only report
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = sorted(glob.glob(f"{d}/*.parquet"))
            if files:
                n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
                print(f"info {name}: no oracle, {n} rows")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
