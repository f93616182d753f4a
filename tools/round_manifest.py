#!/usr/bin/env python3
"""Emit a machine-checkable manifest binding round artifacts to a tree state.

ADVICE r12: verdict claims (277/277 correctness, bench totals, sf1.0
certification) were self-reported prose with no mechanical linkage to a
commit, so a future reader can't distinguish stale artifacts from fresh
ones. This tool records the HEAD SHA, whether the working tree is dirty,
and the sha256 of every round artifact present, into ROUND_MANIFEST.json.
Run it at round close (after the last artifact write, before the final
commit) and commit the manifest; re-running it on a checkout of that
commit must reproduce identical hashes for every tracked artifact.

Usage: python3 tools/round_manifest.py [out.json]
Local tooling only — the Scala library has no Python deps.
"""
import glob
import hashlib
import json
import subprocess
import sys

ARTIFACT_GLOBS = [
    "BENCH_r*.json", "BENCH_sf1.json", "BENCH_streaming*.json",
    "CORRECTNESS_r*.json", "CORRECTNESS_sf1.json",
    "SCALING_sf1.json", "verify_hashes_sf1.json",
    "bench_last.json", "bench_samples*.json",
    "LEAKCHECK.json", "COPYCHECK.json",
    # round-14 additions: the 100x probe, the production sketch bench
    "BENCH_sf10_subset.json", "SCALING_sf10.json", "BENCH_sketch_prod*.json",
    # round-15 additions: the q36 next-decade probe, the sf10 oracle
    # subset certificate, the capped-CF production benches
    "SCALING_q36.json", "CORRECTNESS_sf10_subset.json", "BENCH_cf_prod*.json",
    # round-17 addition: the sf10 subset's canonical content hashes travel
    # with the certificate they back
    "verify_hashes_sf10_subset.json",
    # round-18 additions (VERDICT r17 #1: the committed manifest had gone
    # two rounds stale and omitted every r16/r17 artifact class): host
    # profiles, the skew-invariance measurement, the q36 decade record,
    # the sf10 CF partial hashes the certificate points at, and the
    # production-path sf1.0 bench
    "profile_r*.json", "SKEW_CAPPED_INVARIANCE_*.json",
    "verify_sf10_out/verify_hashes.partial.json",
    "BENCH_prod_sf1.json", "BASELINE.json",
]

# Head-stamp convention (VERDICT r13 #7): the manifest is regenerated as
# the LAST action before the round's closing commit, so its `head` is
# always the PARENT of the commit that ships it — a commit cannot contain
# its own hash. A verifier checks: for the snapshot commit S,
# manifest.head == S^ and every artifact hash matches `git show S:<file>`.


def sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def check_gate_claims():
    """VERDICT r16 #8: round-16's sf10 gate evidence lived only in
    gitignored scratch dirs while SURVEY claimed the gate ran — the
    snapshot must FAIL when a claimed gate has no matching committed
    certificate. Convention: SURVEY.md declares each gate it claims as a
    line `gate-artifact: <file>@<head-prefix>`; this check requires the
    file to exist, parse, be green (ok == total, zero fail), and carry
    the declared head prefix in its own `head` stamp."""
    import re
    claims = []
    for line in open("SURVEY.md"):
        m = re.match(r"\s*gate-artifact:\s*(\S+?)@(\S+)", line)
        if m:
            claims.append((m.group(1), m.group(2)))
    errors = []
    for path, head_prefix in claims:
        try:
            cert = json.load(open(path))
        except (OSError, ValueError) as e:
            errors.append(f"{path}: unreadable ({e})")
            continue
        if not str(cert.get("head", "")).startswith(head_prefix):
            errors.append(f"{path}: head {cert.get('head')!r} does not "
                          f"match claimed @{head_prefix}")
        if cert.get("fail", 0) or cert.get("ok") != cert.get("total"):
            errors.append(f"{path}: not green "
                          f"(ok={cert.get('ok')}/{cert.get('total')}, "
                          f"fail={cert.get('fail')})")
    if errors:
        raise SystemExit("gate-claim check FAILED (SURVEY claims a gate "
                         "with no matching committed certificate):\n  "
                         + "\n  ".join(errors))
    print(f"gate claims: {len(claims)} checked, all green and head-matched")


def main(out="ROUND_MANIFEST.json"):
    head = subprocess.run(["git", "rev-parse", "HEAD"], check=True,
                          capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"], check=True,
                           capture_output=True, text=True).stdout
    check_gate_claims()
    # Pin only TRACKED artifacts: the manifest binds artifacts to a tree
    # state via `git show <snapshot>:<file>`, so a gitignored-but-present
    # file (COPYCHECK.json is driver-generated and deliberately untracked;
    # bench_samples_{subset,prod}.json are local-iteration outputs) can
    # never satisfy the binding — round_close.sh's post-commit check
    # caught exactly this at the first r18 close attempt.
    tracked = set(subprocess.run(["git", "ls-files"], check=True,
                                 capture_output=True, text=True)
                  .stdout.splitlines())
    files = sorted({p for g in ARTIFACT_GLOBS for p in glob.glob(g)
                    if p in tracked})
    manifest = {
        "head": head,
        # The manifest itself is committed after generation, so "dirty"
        # lists what was uncommitted at generation time (should be only
        # the artifacts about to be committed alongside it).
        "dirty_at_generation": sorted(
            line[3:] for line in dirty.splitlines() if line.strip()),
        "artifacts": {p: sha256(p) for p in files},
    }
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"{out}: {len(files)} artifacts pinned to {head[:12]}"
          f"{' (dirty tree)' if dirty else ''}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
