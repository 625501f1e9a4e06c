#!/bin/bash
# Black-box parity proof: run the reference's OWN conformance suites
# (conformance/run_conformance.py — 24 ot_* modules; conformance/run_auth.py
# — auth_basic) through the reference's SHIPPED python client against a
# running GraftServer. Nothing graft-side is in the loop besides the server.
#
# Usage: tools/run_conformance.sh [outdir]   (default /tmp/graft_conformance)
# Requires `sbt compile` first. Writes per-suite logs + a summary, exits
# nonzero if either suite has a failure.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_conformance}
mkdir -p "$OUT"
REF=/root/reference/conformance
PORT=18211

start_server() { # args: port [extra...]
  SPARK_DRIVER_MEM=12g tools/runmain.sh graft.server.GraftServer "$@" \
    > "$OUT/server_$1.log" 2>&1 &
  SRV_PID=$!
  for i in $(seq 1 90); do
    grep -q "listening on" "$OUT/server_$1.log" 2>/dev/null && return 0
    sleep 1
  done
  echo "server on :$1 failed to start" >&2; return 1
}

stop_server() { kill "$SRV_PID" 2>/dev/null; wait "$SRV_PID" 2>/dev/null; }

rc=0

# ---- ot_* suite (24 modules, anonymous server) ----
start_server $PORT || exit 1
PYTHONDONTWRITEBYTECODE=1 python3 "$REF/run_conformance.py" \
  "http://127.0.0.1:$PORT" > "$OUT/ot_suite.log" 2>&1 || rc=1
stop_server

# ---- auth suite (casbin-gated server) ----
start_server $((PORT + 2)) --config tools/conformance_auth.yml || exit 1
PYTHONDONTWRITEBYTECODE=1 python3 "$REF/run_auth.py" \
  "http://127.0.0.1:$((PORT + 2))" \
  --grip_config_file_path tools/conformance_auth.yml \
  > "$OUT/auth_suite.log" 2>&1 || rc=1
stop_server

{
  echo "== ot suite =="
  grep -E "^(Failed|Crashed|Passed [0-9]+ out)" "$OUT/ot_suite.log"
  echo "== auth suite =="
  grep -E "^(Failed|Crashed|Passed [0-9]+ out)" "$OUT/auth_suite.log"
} | tee "$OUT/summary.txt"

# Stamp the run as a committed artifact (date + commit + counts + rc), so a
# round can never CLAIM a conformance re-run its artifacts don't record
# (VERDICT r12 finding #1: SURVEY and CONFORMANCE.md drifted).
mkdir -p artifacts
{
  echo "date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "commit: $(git rev-parse HEAD 2>/dev/null || echo unknown)"
  echo "rc: $rc"
  cat "$OUT/summary.txt"
} > artifacts/CONFORMANCE_LATEST.txt
exit $rc
