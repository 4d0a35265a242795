#!/bin/bash
# Commit the driver-written round snapshot (CORRECTNESS/BENCH/LEAKCHECK
# + the full bench artifact) if any of it is untracked or modified —
# r4/r5/r6 all closed with these riding the working tree (VERDICT r6
# item #1). Run by run_verify.sh on every invocation, and safe to run
# any time: no-op when clean, never touches other files.
set -e
cd "$(dirname "$0")/.."
FILES=$(ls CORRECTNESS_r*.json BENCH_r*.json LEAKCHECK.json bench_full.json 2>/dev/null || true)
[ -z "$FILES" ] && exit 0
git add -- $FILES
if ! git diff --cached --quiet -- $FILES; then
  git commit -m "round snapshot: correctness/bench/leakcheck artifacts" -- $FILES
fi
