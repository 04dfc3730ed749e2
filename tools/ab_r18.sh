#!/bin/bash
# Interleaved A/B: run tools/probe_r18.py for the named queries from the
# pre-change worktree (A) and the working tree (B), alternating run-for-run
# so co-tenant steal pulses hit both sides. Usage:
#   tools/ab_r18.sh PAIRS query [query ...]
set -u
PAIRS=$1; shift
for i in $(seq 1 "$PAIRS"); do
  echo "== pair $i A (before) =="
  (cd /tmp/r18_before && PROBE_REPS=1 PROBE_PLANS= python tools/probe_r18.py "$@" 2>/dev/null)
  echo "== pair $i B (after) =="
  (cd /root/repo && PROBE_REPS=1 PROBE_PLANS= python tools/probe_r18.py "$@" 2>/dev/null)
done
