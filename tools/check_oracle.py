#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dir under verify_out_dir, runs oracle_sql.json[name]
in DuckDB over the sf_dir tables and compares: row count, column names
(sorted), and values. Values are compared as EXACT canonical strings — floats
via repr, Decimals via str (keeping fixed-scale trailing zeros) — so a
DECIMAL-vs-DOUBLE representation split between the two sides fails loudly
here, exactly as it does in the driver's hash compare. No numeric tolerance.
"""
import sys, os, json
import decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical string for hashing-style exact compare (driver-like)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)  # keeps trailing zeros: '710.00' != '710.0'
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files (the locally
            # generated sf1 tier) — DuckDB needs the glob form. Driver
            # tiers are single files and take the plain path.
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
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
            # driver-style: columns sorted by name, rows sorted by canonical
            # string, every value compared as an exact canonical string
            gidx = [got_cols.index(c) for c in sorted(got_cols)]
            eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
            g = sorted(tuple(canon(r[i]) for i in gidx) for r in got)
            e = sorted(tuple(canon(r[i]) for i in eidx) for r in exp)
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
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
