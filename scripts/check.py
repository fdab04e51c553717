#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir parquet
tables, and compares: columns sorted by name, rows sorted, values
hashed.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # the heavy graph-CTE oracles (bfs/kcore/label_prop at sf0.1) need
    # tens of GB: cap memory below the box limit and spill to a temp
    # dir that is REMOVED afterwards — an uncapped run OOM-kills the
    # process silently, and default spill into ./.tmp once stranded
    # 63 GB of duckdb_temp_storage files in the repo
    spill = os.path.join("/tmp", f"duckdb_spill_{os.getpid()}")
    os.makedirs(spill, exist_ok=True)
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_DUCKDB_MEM", "48GB"))
    con.execute(f"SET temp_directory='{spill}'")
    import atexit, shutil
    atexit.register(lambda: shutil.rmtree(spill, ignore_errors=True))
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracles:
            print(f"  [rows-only] {name}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  [FAIL-oracle-sql] {name}: {e}")
            n_fail += 1
            continue
        try:
            g, e = normalize(got), normalize(exp)
        except Exception as ex:
            print(f"  [FAIL-normalize] {name}: {ex}")
            n_fail += 1
            continue
        ok_schema = list(g.columns) == list(e.columns)
        ok_rows = len(g) == len(e)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                gh = pd.util.hash_pandas_object(g.astype(str), index=False).sum()
                eh = pd.util.hash_pandas_object(e.astype(str), index=False).sum()
                ok_vals = gh == eh
            except Exception as ex:
                print(f"    hash error: {ex}")
        status = "PASS" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
            print(f"  [{status}] {name}: schema={ok_schema} "
                  f"rows={ok_rows}({len(g)}vs{len(e)}) vals={ok_vals}")
            if ok_schema and ok_rows and not ok_vals:
                diff = (g.astype(str) != e.astype(str)).any(axis=1)
                print("    first diffs (got | exp):")
                print(pd.concat([g[diff].head(3), e[diff].head(3)],
                                keys=["got", "exp"]))
            elif not ok_schema:
                print(f"    got cols: {list(g.columns)} {[str(t) for t in g.dtypes]}")
                print(f"    exp cols: {list(e.columns)} {[str(t) for t in e.dtypes]}")
        if status == "PASS":
            print(f"  [PASS] {name} ({len(g)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
