#!/usr/bin/env python3
"""Merge a targeted (SPARK_GRAFT_ONLY) Bench audit into a full-suite audit.

Used when a plan fix changes a handful of queries and re-running the full
multi-hundred-query suite at that scale factor doesn't fit the round: the
patched queries' fresh two-pass samples REPLACE their entries in the full
audit, every other query keeps its original samples, and the summary file's
per-query minima and total are recomputed. The patched query list is
recorded in the audit under "patched" so provenance is auditable.

Usage: python3 tools/merge_bench_patch.py full_samples.json patch_samples.json \
           full_bench.json
Local tooling only — the Scala library has no Python deps.
"""
import sys, json, os, tempfile

def write_atomic(path, obj):
    """In-place rewrite via tmp+rename: a crash mid-dump can no longer
    truncate the only copy of a round's audit file."""
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               prefix=os.path.basename(path) + ".")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, separators=(",", ":"))
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise

def sentinel_load(audit):
    return max(float(audit.get("sentinel", {}).get("load", 1.0)), 1.0)

def main(full_path, patch_path, bench_path):
    full = json.load(open(full_path))
    patch = json.load(open(patch_path))
    # Per-query sentinel load of the run each query's CURRENT samples came
    # from — a patched query was measured under the patch run's load, not
    # the base run's, and the normalized total must reflect that
    # (ADVICE/VERDICT r14: a merge that leaves value_norm stale makes the
    # summary self-inconsistent).
    loads = full.get("loads",
                     {q: sentinel_load(full) for q in full["samples"]})
    for q, ss in patch["samples"].items():
        if q not in full["samples"]:
            raise SystemExit(f"patch query {q} not in full audit")
        print(f"{q}: {min(full['samples'][q]):.3f}s -> {min(ss):.3f}s")
        full["samples"][q] = ss
        loads[q] = sentinel_load(patch)
    full["loads"] = loads
    full["patched"] = sorted(set(full.get("patched", [])) | set(patch["samples"]))
    best = {k: min(v) for k, v in full["samples"].items()}
    total = sum(best.values())
    # loads.get with the base run's sentinel fallback: a pre-existing
    # "loads" dict may lack entries for samples an older tool version
    # added after a newer-version merge (ADVICE r15) — missing keys take
    # the base run's load instead of raising KeyError.
    total_norm = sum(v / loads.get(k, sentinel_load(full))
                     for k, v in best.items())
    full["total"] = f"{total:.3f}"
    full["total_norm"] = f"{total_norm:.3f}"
    write_atomic(full_path, full)
    # Rebuild the summary line (short qNN keys, like Bench's stdout line).
    # The qNN prefixes must be unique or the dict silently drops queries
    # and the rebuilt total disagrees with the audit's.
    prefixes = [k.split("_")[0] for k in sorted(best)]
    dupes = sorted({p for p in prefixes if prefixes.count(p) > 1})
    if dupes:
        raise SystemExit(f"non-unique qNN prefixes, summary would drop "
                         f"queries: {dupes}")
    bench = json.load(open(bench_path))
    qs = {k.split("_")[0]: round(v, 3) for k, v in sorted(best.items())}
    bench["queries"] = qs
    bench["value"] = round(total, 3)
    bench["value_norm"] = round(total_norm, 3)
    # Keep the grading-tier decomposition in sync with the recomputed
    # value (ADVICE r15): a patched grade-set query would otherwise leave
    # value_grade/value_prod stale against the new total. The grade set is
    # READ FROM THE ARTIFACT (Bench.scala emits "grade_set" since r17) so
    # a Scala-side rename/addition can't leave this tool recomputing with
    # a stale mirror (ADVICE r16); the literal fallback only covers
    # pre-r17 artifacts that lack the field.
    if "value_grade" in bench or "value_prod" in bench:
        grade_set = set(bench.get("grade_set", ["q280_cf_cap_quality"]))
        total_grade = sum(v for k, v in best.items() if k in grade_set)
        bench["value_grade"] = round(total_grade, 3)
        bench["value_prod"] = round(total - total_grade, 3)
    bench["patched"] = full["patched"]
    write_atomic(bench_path, bench)
    print(f"total: {total:.3f}s over {len(best)} queries -> {full_path}, {bench_path}")

if __name__ == "__main__":
    main(*sys.argv[1:4])
