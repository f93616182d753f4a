#!/usr/bin/env python3
"""q36 candidate-volume probe across scale decades (VERDICT r14 Next #3).

q36 (exact n-gram Jaccard) flagged 30.9x runtime growth on 10x data at
sf10. The diagnosis: the ScaleUp derivation leaves ~half the vocabulary
shared across replicas, so shared-shingle document frequencies grow with
reps while staying UNDER the maxShingleDf=1000 stop-shingle cap (max kept
df 896 at sf10) -- the transition regime where candidate volume
Sigma C(df,2) over kept shingles grows ~quadratically. The claim to pin:
one decade further the shared shingles EXCEED the cap and drop out, so
candidate volume collapses back to linear (Sigma C(min(df,cap),2) is
linear in N with constant proportional to cap once buckets saturate).

This tool measures that claim: for each documents.parquet it computes the
exact shingle-df distribution of the q36 pipeline (same tokenization and
3-gram shingling as the oracle twin; df taken on string shingles -- the
md5-prefix hash is injective modulo ~2%% collisions and doesn't move the
regime) and reports candidate volume with and without the cap.

Usage: python3 tools/q36_decade_probe.py OUT.json LABEL=PATH [LABEL=PATH ...]
e.g.:  python3 tools/q36_decade_probe.py SCALING_q36.json \
         sf1.0=testdata_sf1.0/documents.parquet \
         sf10=testdata_sf10/documents.parquet \
         sf100=testdata_q36_sf100/documents.parquet
Local tooling only -- the Scala library has no Python deps.
"""
import sys, json, os
import duckdb

CAP = int(os.environ.get("Q36_CAP", "1000"))

PROBE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM read_parquet(?)),
sh AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(range(0, len(t) - 2),
      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS shingle
  FROM toks WHERE len(t) >= 3),
df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
SELECT
  (SELECT count(*) FROM toks) AS n_docs,
  count(*) AS n_shingles,
  max(CASE WHEN df <= ? THEN df END) AS max_kept_df,
  max(df) AS max_df,
  sum(CASE WHEN df > ? THEN 1 ELSE 0 END) AS n_stop_shingles,
  sum(CASE WHEN df <= ? THEN df * (df - 1) // 2 ELSE 0 END) AS candidate_pairs,
  sum(df * (df - 1) // 2) AS candidate_pairs_uncapped
FROM df
"""

def main(out_path, *specs):
    con = duckdb.connect()
    con.execute("SET temp_directory='.duckdb_tmp_q36'")
    rows = []
    for spec in specs:
        label, path = spec.split("=", 1)
        r = con.execute(PROBE, [path, CAP, CAP, CAP]).fetchone()
        row = dict(zip(["n_docs", "n_shingles", "max_kept_df", "max_df",
                        "n_stop_shingles", "candidate_pairs",
                        "candidate_pairs_uncapped"], [int(x) for x in r]))
        row["label"] = label
        row["path"] = path
        rows.append(row)
        print(f"{label}: docs={row['n_docs']:,} candidates={row['candidate_pairs']:,} "
              f"max_kept_df={row['max_kept_df']} stop_shingles={row['n_stop_shingles']:,}")
    for prev, cur in zip(rows, rows[1:]):
        cur["docs_growth"] = round(cur["n_docs"] / prev["n_docs"], 2)
        cur["candidate_growth"] = round(
            cur["candidate_pairs"] / max(prev["candidate_pairs"], 1), 2)
        print(f"{prev['label']} -> {cur['label']}: docs x{cur['docs_growth']}, "
              f"candidates x{cur['candidate_growth']}")
    json.dump({"cap": CAP, "decades": rows}, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")

if __name__ == "__main__":
    main(*sys.argv[1:])
