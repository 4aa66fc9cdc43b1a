#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>.parquet the Spark-side Verify dumped, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata tables,
then compares: row count, sorted-column-name schema, and a value hash
computed over rows sorted by all columns (floats rounded to 9 sig decimals
to absorb last-ulp noise). Queries without oracle SQL get a rows>0 check.
"""
import sys, json, math, hashlib, os
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [d for d in os.listdir(out_dir)
             if os.path.isdir(os.path.join(out_dir, d))]
    n_pass = n_fail = 0
    for name in sorted(names):
        res = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = [d[0] for d in res.description]
        srows = res.fetchall()
        if name not in oracle:
            ok = len(srows) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only: {len(srows)} rows)")
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            ores = con.execute(oracle[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name} oracle-error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if not problems and table_hash(scols, srows) != table_hash(ocols, orows):
            problems.append("hash mismatch")
            sset = {tuple(canon(v) for v in r) for r in srows}
            oset = {tuple(canon(v) for v in r) for r in orows}
            ex_s = list(sset - oset)[:2]
            ex_o = list(oset - sset)[:2]
            problems.append(f"spark-only={ex_s} oracle-only={ex_o}")
        if problems:
            print(f"FAIL {name}: {'; '.join(str(p) for p in problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
