#!/usr/bin/env python3
"""Per-query scale-up triage: compare two Bench audit files (e.g. sf0.1 vs
sf1.0) and flag queries whose runtime grew beyond an expected factor.

The expected factor is data growth (default 10x) times a slack for
constant overheads amortizing differently; a query is flagged when
  t_big / max(t_small, floor_s) > growth * slack
using per-query two-pass minimums from each audit file. Queries dominated
by fixed overhead (t_small below floor_s) are held to an absolute bound
instead (growth * slack * floor_s).

Usage: python3 tools/scaling_report.py bench_samples_small.json \
           bench_samples_big.json [growth] [slack] [out.json]
Local tooling only — the Scala library has no Python deps.
"""
import sys, json

def mins(path):
    d = json.load(open(path))
    return {k: min(v) for k, v in d["samples"].items()}, d

def main(small_path, big_path, growth=10.0, slack=2.0, floor_s=0.5,
         out_path="SCALING_sf1.json"):
    small, _ = mins(small_path)
    big, draw = mins(big_path)
    shared = sorted(set(small) & set(big))
    rows = []
    for q in shared:
        ts, tb = small[q], big[q]
        base = max(ts, floor_s)
        ratio = tb / base
        rows.append((q, ts, tb, ratio, ratio > growth * slack))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[4]]
    print(f"{len(shared)} shared queries; growth={growth} slack={slack} "
          f"floor={floor_s}s; flagged={len(flagged)}")
    print(f"{'query':42s} {'small_s':>8s} {'big_s':>8s} {'ratio':>7s}")
    for q, ts, tb, ratio, bad in rows[:25]:
        mark = ' <-- SUPER-LINEAR' if bad else ''
        print(f"{q:42s} {ts:8.3f} {tb:8.3f} {ratio:7.2f}{mark}")
    tot_s = sum(small[q] for q in shared)
    tot_b = sum(big[q] for q in shared)
    print(f"\ntotals: small={tot_s:.1f}s big={tot_b:.1f}s "
          f"aggregate ratio={tot_b/tot_s:.2f}")
    out = {
        "flagged": [{"query": q, "small_s": ts, "big_s": tb,
                     "ratio": round(r, 2)} for q, ts, tb, r, bad in flagged],
        "total_small_s": round(tot_s, 1), "total_big_s": round(tot_b, 1),
        "aggregate_ratio": round(tot_b / tot_s, 2),
        "n_queries": len(shared), "growth": growth, "slack": slack,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")
    return 0

if __name__ == "__main__":
    a = sys.argv
    sys.exit(main(a[1], a[2], float(a[3]) if len(a) > 3 else 10.0,
                  float(a[4]) if len(a) > 4 else 2.0,
                  out_path=a[5] if len(a) > 5 else "SCALING_sf1.json"))
