#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the sf parquet tables, and compare rows / schema / value hash
with columns sorted by name. Usage: check_correctness.py OUTDIR SFDIR.

Driver-side tooling only (python/duckdb are not available to the library).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for _, row in df.iterrows():
        for v in row:
            if isinstance(v, float):
                v = f"{v:.10g}"
            h.update(repr(v).encode())
        h.update(b"\n")
    return h.hexdigest()


def main(outdir: str, sfdir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        qdir = f"{outdir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = {"err": "no spark output"}
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            ora_df = con.execute(oracle[name]).df()
            s, o = norm(spark_df), norm(ora_df)
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns)
            hmatch = rows and schema and value_hash(s) == value_hash(o)
            results[name] = {
                "rows_match": rows, "schema_match": schema, "hash_match": hmatch,
                "spark_rows": len(s), "oracle_rows": len(o), "err": None}
        except Exception as e:
            results[name] = {"err": str(e)[:300]}
    bad = {k: v for k, v in results.items()
           if v.get("err") or not v.get("hash_match")}
    print(f"{len(results) - len(bad)}/{len(results)} pass")
    for k, v in bad.items():
        print("FAIL", k, json.dumps(v))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
