#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each query's
parquet dump, runs the corresponding oracle SQL in DuckDB over the same
testdata parquet tables, and compares (column names sorted, rows sorted,
exact value equality). Not part of the shipped library.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return repr(round(v, 9))
    return repr(v)

def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_bad += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"COLS  {name}: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_bad += 1
            continue
        sk, ok = rows_key(s_rows, s_cols), rows_key(o_rows, o_cols)
        if len(sk) != len(ok):
            print(f"NROWS {name}: spark={len(sk)} oracle={len(ok)}")
            n_bad += 1
        elif sk != ok:
            diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            print(f"HASH  {name}: first diffs {diffs}")
            n_bad += 1
        else:
            print(f"ok    {name} ({len(sk)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok / {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
