#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (dev loop only; the
Scala library has no Python dependency). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (graft.Verify output) and
<verifyOutDir>/oracle_sql.json, runs each oracle against the sfDir tables in
DuckDB, and compares row count, column names, and values (positional and
sorted-row hash). Reports per-query PASS/FAIL with a first-diff sample.
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # full precision
    return str(v)

def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    return [cols[i] for i in order], data

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or (only and name not in only):
            continue
        files = sorted(glob.glob(f"{qdir}/*.parquet"))
        if not files:
            print(f"[{name}] NO OUTPUT");  n_fail += 1;  continue
        got_cols, got = rows_of(con.execute(
            f"SELECT * FROM read_parquet({files!r})"))
        if name not in oracles:
            print(f"[{name}] rows-only: {len(got)} rows, cols={got_cols}")
            continue
        try:
            exp_cols, exp = rows_of(con.execute(oracles[name]))
        except Exception as e:
            print(f"[{name}] ORACLE SQL ERROR: {e}");  n_fail += 1;  continue
        ok = True
        if got_cols != exp_cols:
            print(f"[{name}] COLS MISMATCH got={got_cols} exp={exp_cols}"); ok = False
        elif len(got) != len(exp):
            print(f"[{name}] ROWCOUNT got={len(got)} exp={len(exp)}"); ok = False
        elif got != exp:
            ok = False  # driver's hash compare is order-sensitive: order-only counts as FAIL
            if sorted(got) == sorted(exp):
                print(f"[{name}] ORDER-ONLY MISMATCH (values equal when sorted)")
            else:
                for i, (g, e) in enumerate(zip(got, exp)):
                    if g != e:
                        print(f"[{name}] VALUE MISMATCH at row {i}:\n  got={g}\n  exp={e}")
                        break
                else:
                    print(f"[{name}] VALUE MISMATCH (extra/missing rows)")
        if ok:
            n_pass += 1
            print(f"[{name}] PASS ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
