#!/usr/bin/env python3
"""Transfer or refresh the sf1.0 correctness certificate to a new HEAD.

The round-13 verdict's provenance finding: CORRECTNESS_sf1.json was
stamped at a mid-round commit, and the argument that it still applied at
round-close HEAD ("Verify's content hashes are byte-identical, so the
oracle verdict transfers") lived only in prose. This tool makes that
argument mechanical:

  1. Compare a HEAD-fresh Verify hash file against the certified one.
  2. Queries with identical (rows, sha256, oracle_sha256) inherit their
     oracle verdict — the Spark output is bit-identical AND the oracle SQL
     text is unchanged, so re-running DuckDB would reproduce the same
     comparison. The oracle_sha256 field (ADVICE r14) closes the hole
     where a changed oracle twin silently inherited a verdict the new SQL
     never produced.
  3. Queries whose hashes changed (or are new) are listed for a targeted
     oracle re-run; the caller passes the oracle log back in and the
     certificate is rewritten at the new HEAD with full provenance:
     `transferred_from` (the old certified head) and `reverified` (the
     queries that got a fresh oracle run this time).

Usage:
  python3 tools/recert.py diff <certified_hashes.json> <fresh_hashes.json>
      Prints a comma-separated list of queries needing a fresh oracle run
      (empty output = pure transfer). Exit 2 if queries DISAPPEARED from
      the fresh run (certificate cannot transfer).
  python3 tools/recert.py write <cert.json> <certified_hashes.json> \
      <fresh_hashes.json> <head_sha> <sf_label> [oracle_log]
      Rewrites <cert.json> at <head_sha>; queries in the changed set must
      appear as OK in <oracle_log> or the cert records them failed.
"""
import sys, json, re


def load(p):
    return json.load(open(p))


def changed_set(cert_hashes, fresh_hashes):
    gone = sorted(set(cert_hashes) - set(fresh_hashes))
    if gone:
        print(f"recert: {len(gone)} certified queries missing from fresh "
              f"verify: {','.join(gone[:10])}", file=sys.stderr)
        sys.exit(2)
    return sorted(n for n in fresh_hashes
                  if cert_hashes.get(n) != fresh_hashes[n])


def main():
    mode = sys.argv[1]
    if mode == "diff":
        cert_h, fresh_h = load(sys.argv[2]), load(sys.argv[3])
        print(",".join(changed_set(cert_h, fresh_h)))
        return
    assert mode == "write", f"unknown mode {mode}"
    cert_path, cert_hp, fresh_hp, head, sf = sys.argv[2:7]
    oracle_log = sys.argv[7] if len(sys.argv) > 7 else None
    old_cert = load(cert_path)
    cert_h, fresh_h = load(cert_hp), load(fresh_hp)
    changed = changed_set(cert_h, fresh_h)

    ok_log, fail_log = set(), set()
    if oracle_log:
        for line in open(oracle_log):
            m = re.match(r"(OK|FAIL)\s+(\S+?):", line)
            if m:
                (ok_log if m.group(1) == "OK" else fail_log).add(m.group(2))
    not_rerun = [n for n in changed if n not in ok_log and n not in fail_log]
    if not_rerun:
        print(f"recert: {len(not_rerun)} changed queries lack an oracle "
              f"verdict: {','.join(not_rerun[:10])}", file=sys.stderr)
        sys.exit(2)

    prev_failed = set(old_cert.get("failed", []))
    # transferred queries keep their old verdict; changed ones take the log's
    failed = sorted((prev_failed - set(changed)) | fail_log)
    total = len(fresh_h)
    cert = {
        "sf": sf,
        "head": head,
        "total": total,
        "ok": total - len(failed),
        "fail": len(failed),
        "failed": failed,
        "transferred_from": old_cert.get("head"),
        "transferred": total - len(changed),
        "reverified": changed,
        "generated_by": "tools/recert.py (hash-transfer: identical Verify "
                        "content hashes inherit the certified oracle verdict)",
    }
    json.dump(cert, open(cert_path, "w"), indent=1)
    print(f"{cert_path}: {cert['ok']}/{total} ok at {head} "
          f"({cert['transferred']} transferred from {cert['transferred_from']}, "
          f"{len(changed)} reverified)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
