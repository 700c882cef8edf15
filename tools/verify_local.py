#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: compare graft.Verify parquet
dumps against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        # driver sorts columns by name before hashing values
        eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1; continue
        # arrow-level type compare: the driver's hash is type-sensitive
        # (e.g. DuckDB HUGEINT -> decimal128 vs Spark BIGINT -> int64)
        e_schema = con.execute(sql).arrow().schema
        g_schema = con.execute(f"SELECT * FROM read_parquet({files!r})").arrow().schema
        e_types = {f.name: str(f.type) for f in e_schema}
        g_types = {f.name: str(f.type) for f in g_schema}
        if e_types != g_types:
            diff = {k: (g_types.get(k), e_types.get(k))
                    for k in set(e_types) | set(g_types)
                    if e_types.get(k) != g_types.get(k)}
            print(f"FAIL {name}: arrow types differ (got, exp): {diff}")
            n_fail += 1; continue
        e_rows = sorted((tuple(norm(r[i]) for i in eidx) for r in exp), key=repr)
        g_rows = sorted((tuple(norm(r[i]) for i in gidx) for r in got), key=repr)
        if len(e_rows) != len(g_rows):
            print(f"FAIL {name}: rows {len(g_rows)} != {len(e_rows)}"); n_fail += 1; continue
        bad = [(a, b) for a, b in zip(g_rows, e_rows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(e_rows)} rows differ; first: got={bad[0][0]} exp={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(e_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
