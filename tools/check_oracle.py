#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate — STRICT mode.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each query's
parquet dump, runs the corresponding oracle SQL in DuckDB over the same
testdata parquet tables, and compares column names, pandas DTYPES, and exact
values (no rounding tolerance).

Why strict: the previous version compared `fetchall()` Python objects with a
9-decimal round, which silently coerced DuckDB HUGEINT (sum() of integers) to
Python int and hid type drift that the driver's hash gate catches — 15 queries
were locally "bit-identical" yet failed the driver in rounds 4-5. Going through
`.df()` on BOTH sides makes HUGEINT surface as float64/object and int-width
differences surface as dtype mismatches, mirroring the gate. Not part of the
shipped library.
"""
import json, sys, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # exact canonical form; no rounding tolerance
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    try:
        import numpy as np
        if isinstance(v, np.floating):
            f = float(v)
            return "<nan>" if math.isnan(f) else repr(f)
        if isinstance(v, np.integer):
            return repr(int(v))
        if isinstance(v, np.bool_):
            return repr(bool(v))
    except ImportError:
        pass
    return repr(v)


def canon_rows(df):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(norm(v) for v in row))
    out.sort()
    return out


def dtype_sig(df):
    return {c: str(df[c].dtype) for c in df.columns}


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver-generated testdata is a single parquet FILE; replicas
        # (ReplicateTestdata) are Spark-written DIRECTORIES of part files
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output")
            n_bad += 1
            continue
        try:
            s_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            o_df = con.execute(sql).df()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_bad += 1
            continue
        if sorted(s_df.columns) != sorted(o_df.columns):
            print(f"COLS  {name}: spark={sorted(s_df.columns)} "
                  f"oracle={sorted(o_df.columns)}")
            n_bad += 1
            continue
        s_t, o_t = dtype_sig(s_df), dtype_sig(o_df)
        # compare dtype KINDS, not widths: the driver gate tolerates
        # int32-vs-int64 (q187 ntile has passed it for rounds) but fails
        # int-vs-float64/object (the HUGEINT class)
        def kind(df, c):
            k = df[c].dtype.kind
            return "i" if k == "u" else k  # signed/unsigned equivalent
        bad_t = {c: (s_t[c], o_t[c]) for c in s_t
                 if kind(s_df, c) != kind(o_df, c)}
        if bad_t:
            print(f"DTYPE {name}: {bad_t}")
            n_bad += 1
            continue
        sk, ok = canon_rows(s_df), canon_rows(o_df)
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3:]) or None))
