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

# Persist the builder's closing bench under a name the driver won't
# clobber (VERDICT r12 #1): the driver overwrites bench_out.json each
# round, which destroyed the r12 warm numbers. A full-catalog run with
# at least one timed pass is copied to BENCH_builder.json; dev-loop
# artifacts (BENCH_ONLY subsets, warmup-only runs) are ignored.
if [ -f bench_out.json ]; then
  if python3 -c '
import json, sys
d = json.load(open("bench_out.json"))
full = d.get("completed", 0) == d.get("planned", -1)
ok = full and d.get("passes", 0) >= 1 and not d.get("errors")
sys.exit(0 if ok else 1)'; then
    if ! cmp -s bench_out.json BENCH_builder.json 2>/dev/null; then
      cp bench_out.json BENCH_builder.json
      echo "final_gate: persisted bench_out.json -> BENCH_builder.json" \
        "(commit it)" >&2
    fi
  fi
fi

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
