#!/bin/bash
# Round-end final gate (VERDICT r11 "next round" #4): refuse to finish
# a session with a tree that is dirty or does not compile. Run AFTER
# the literal last edit of the session, BEFORE the snapshot — the r11
# snapshot captured a half-finished refactor that broke the build and
# zeroed the round's driver gate.
#
# Usage: scripts/final_gate.sh [--allow-dirty]
#   --allow-dirty  skip the clean-tree check (mid-round compile gate)
set -u
cd "$(dirname "$0")/.."

fail() { echo "FINAL GATE FAIL: $*" >&2; exit 1; }

if [ "${1:-}" != "--allow-dirty" ]; then
  if [ -n "$(git status --porcelain)" ]; then
    git status --porcelain >&2
    fail "dirty tree — commit or stash before ending the session"
  fi
fi

sbt -batch compile >/tmp/final_gate_compile.log 2>&1 ||
  { tail -20 /tmp/final_gate_compile.log >&2; fail "sbt compile failed"; }

echo "FINAL GATE OK: $(git rev-parse --short HEAD) clean, compiles" \
  "($(date -u +%FT%TZ))"
