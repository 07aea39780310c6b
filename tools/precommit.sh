#!/usr/bin/env bash
# Pre-commit guard: refuse any commit whose tree does not compile.
#
# Root cause being guarded (round-10 postmortem): the end-of-round snapshot
# commit 904f840 shipped `dim > 1 << 20` — Scala parses that as
# `(dim > 1) << 20` — and HEAD stopped compiling, which blanked the
# round's driver CORRECTNESS/BENCH artifacts. Compiling both main and
# test sources before every commit makes that class of failure impossible.
#
# Install (once per clone):
#   git config core.hooksPath tools/hooks
# or
#   ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
#
# Bypass (emergencies only, leaves an audit trail in the reflog):
#   git commit --no-verify
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
echo "[precommit] sbt Test/compile ..." >&2
log=$(mktemp /tmp/precommit_compile.XXXXXX)
trap 'rm -f "$log"' EXIT
if ! sbt -batch Test/compile > "$log" 2>&1; then
  echo "[precommit] COMPILE FAILED - commit blocked. Tail of log:" >&2
  tail -20 "$log" >&2
  exit 1
fi
echo "[precommit] compile green" >&2
