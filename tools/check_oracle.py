#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dir under verify_out_dir, runs oracle_sql.json[name]
in DuckDB over the sf_dir tables and compares: row count, column names
(sorted), and values (sorted rows, exact for non-floats, 1e-9 rel tol for
floats). Stricter than any plausible driver compare — if this passes, the
driver's hash match should too.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            ok = False
        else:
            # reorder spark columns to oracle order by name
            idx = [got_cols.index(c) for c in exp_cols]
            skey = lambda t: [(v is None, str(v)) for v in t]
            g = sorted((tuple(norm(r[i]) for i in idx) for r in got), key=skey)
            e = sorted((tuple(norm(v) for v in r) for r in exp), key=skey)
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    # allow tiny float diffs
                    close = all(
                        (isinstance(x, float) and isinstance(y, float)
                         and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9))
                        or x == y
                        for x, y in zip(a, b))
                    if not close:
                        print(f"FAIL {name}: first diff row {i}:\n  spark={a}\n  duck ={b}")
                        ok = False
                        break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
