#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs graft.Verify output.

Mimics the driver's correctness gate: for each query, load the Spark result
parquet (written by graft.Verify) and run the oracle SQL in DuckDB over the
raw testdata parquet tables; compare as sorted multisets of rows with columns
sorted by name. Local tooling only — the Scala library has no Python deps.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Conservative resource caps: DuckDB's default memory_limit is 80% of
    # PHYSICAL RAM regardless of co-tenants — run concurrently with a big
    # Spark JVM it overcommits, spills tens of GB, and dies on ENOSPC
    # (observed on q239's oracle at sf1.0). 25 GB + an explicit temp dir
    # keeps the heaviest oracle (~450k-row final join over a 6M-row CF
    # chain) comfortably inside bounds.
    # Both caps are env-overridable: a solo retry of one heavy oracle on an
    # otherwise idle box can afford a bigger memory limit, and pointing the
    # temp at /dev/shm sidesteps a near-full root disk (q239's sf1.0 spill
    # peaked >40 GB and hit ENOSPC in round 13 with 32 GB free).
    import os
    con.execute(
        f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '25GB')}'")
    tmp = os.environ.get('GRAFT_DUCKDB_TMP', f'{out_dir}/.duckdb_tmp')
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    failures = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(exp_cols)}")
            failures += 1
            continue
        g, e = canon(got, got_cols), canon(exp, exp_cols)
        if g == e:
            print(f"OK   {name}: {len(g)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            diff_g = [r for r in g if r not in set(e)][:3]
            diff_e = [r for r in e if r not in set(g)][:3]
            print(f"     spark-only: {diff_g}")
            print(f"     oracle-only: {diff_e}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
