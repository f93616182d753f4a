#!/usr/bin/env python3
"""Assemble BENCH_cf_prod_sf10_skew.json — the round-16 exact-vs-capped
CF A/B on the power-law (zipf-head) sf10 derivation, plus the q280
quality report run AT the skewed operating point and the DuckDB-counted
pair-work decomposition. Local tooling only.

Usage: tools/skew_ab_report.py <capped_bench.json> <exact_bench.json> \
           <q280_parquet_dir> <out.json> [skew_dataset_dir] [cap]
"""
import sys, json, glob


def degree_shape(con, dataset_dir, cap):
    """Compute the degree-shape stats FROM the derivation (ADVICE r16:
    the round-16 version inlined that round's corpus constants, so a
    rerun against any other derivation/skew setting would stamp stale
    provenance into a supposedly self-contained report)."""
    q = f"""
      WITH deg AS (
        SELECT o_custkey AS u, count(*)::BIGINT AS n,
               count(DISTINCT l_partkey)::BIGINT AS d
        FROM read_parquet('{dataset_dir}/orders.parquet') o
        JOIN read_parquet('{dataset_dir}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1)
      SELECT sum(n)::BIGINT                          AS n_ratings,
             count(*)::BIGINT                        AS n_users,
             max(d)::BIGINT                          AS max_user_degree,
             sum(d*(d-1)//2)::BIGINT                 AS exact_pair_work,
             sum(least(d,{cap})*(least(d,{cap})-1)//2)::BIGINT AS capped_pair_work
      FROM deg"""
    r = con.execute(q).fetchone()
    return {"n_ratings": r[0], "n_users": r[1], "max_user_degree": r[2],
            "exact_pair_work_sum_C_d_2": r[3],
            f"capped_pair_work_sum_C_min_d_{cap}_2": r[4],
            "note": "computed from the dataset at report time (cap bounds "
                    "pair generation at Sigma min(deg,cap)^2)"}


def main(capped_p, exact_p, q280_dir, out_p,
         dataset_dir="testdata_sf10_skew", cap=64):
    capped = json.load(open(capped_p))
    exact = json.load(open(exact_p))
    # q280 report row (spark output parquet written by graft.Verify)
    import duckdb
    con = duckdb.connect()
    files = glob.glob(f"{q280_dir}/*.parquet")
    row = None
    if files:
        cur = con.execute(f"SELECT * FROM read_parquet({files!r})")
        cols = [d[0] for d in cur.description]
        row = dict(zip(cols, [int(v) for v in cur.fetchall()[0]]))
    report = {
        "dataset": dataset_dir,
        "degree_shape": degree_shape(con, dataset_dir, int(cap)),
        "runs": {
            "capped (SPARK_GRAFT_SKETCH_PROD=1)": capped,
            "exact": exact},
        "q280_quality_at_skew": row,
    }
    json.dump(report, open(out_p, "w"), indent=1)
    cq = capped.get("queries", {})
    eq = exact.get("queries", {})
    print(f"capped total {capped['value']}s, exact total {exact['value']}s")
    for k in sorted(set(cq) | set(eq)):
        print(f"  {k}: capped {cq.get(k)}s  exact {eq.get(k)}s")


if __name__ == "__main__":
    main(*sys.argv[1:7])
