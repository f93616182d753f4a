#!/usr/bin/env bash
# Round-close snapshot procedure (VERDICT r17 #1): regenerate
# ROUND_MANIFEST.json as the LAST action before the round's closing
# commit, with the gate-claim check wired in so a stale manifest can no
# longer ship. This script IS the closing commit: it refuses to proceed
# when check_gate_claims() fails, commits the manifest together with
# whatever round artifacts are staged, and then verifies the binding it
# just created (manifest.head == the new commit's parent).
#
# Usage: tools/round_close.sh "<commit message>"
# Stage the round's artifacts first (git add ...); this script adds only
# ROUND_MANIFEST.json on top.
set -euo pipefail
cd "$(dirname "$0")/.."
MSG=${1:?usage: tools/round_close.sh "<commit message>"}

# 1. Regenerate the manifest. round_manifest.py runs check_gate_claims()
#    internally and exits non-zero when SURVEY.md claims a gate with no
#    matching committed certificate — that failure aborts the close here.
python3 tools/round_manifest.py

# 2. The manifest must stamp the CURRENT head (= the parent of the commit
#    about to be made). Verify before committing.
HEAD_NOW=$(git rev-parse HEAD)
MAN_HEAD=$(python3 -c "import json; print(json.load(open('ROUND_MANIFEST.json'))['head'])")
if [ "$MAN_HEAD" != "$HEAD_NOW" ]; then
  echo "refusing to commit: manifest head $MAN_HEAD != current HEAD $HEAD_NOW"
  exit 1
fi

# 3. Commit manifest + staged artifacts.
git add ROUND_MANIFEST.json
git commit -m "$MSG"

# 4. Post-commit verification of the head-stamp convention: for snapshot
#    commit S, manifest.head must equal S^ and every pinned artifact's
#    hash must match `git show S:<file>`.
S=$(git rev-parse HEAD)
PARENT=$(git rev-parse "$S^")
if [ "$MAN_HEAD" != "$PARENT" ]; then
  echo "WARNING: manifest head $MAN_HEAD != parent $PARENT of snapshot $S"
  exit 1
fi
python3 - "$S" <<'EOF'
import json, subprocess, sys, hashlib
s = sys.argv[1]
man = json.load(open('ROUND_MANIFEST.json'))
bad = []
for path, want in man['artifacts'].items():
    p = subprocess.run(['git', 'show', f'{s}:{path}'], capture_output=True)
    if p.returncode != 0:
        bad.append(f'{path}: not in snapshot commit')
        continue
    got = hashlib.sha256(p.stdout).hexdigest()
    if got != want:
        bad.append(f'{path}: committed hash != manifest hash')
if bad:
    print('snapshot binding FAILED:\n  ' + '\n  '.join(bad))
    sys.exit(1)
print(f"snapshot binding verified: {len(man['artifacts'])} artifacts "
      f"committed at {s[:12]}, manifest head = parent {man['head'][:12]}")
EOF
