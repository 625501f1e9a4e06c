#!/bin/bash
# Pre-snapshot gate: refuse to end a session with a tree that doesn't build.
# Runs main+test compile, then one sf0.001 smoke query through SparkEntry.
# Usage: tools/preflight.sh   (exit 0 = safe to snapshot, loud nonzero otherwise)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt compile Test/compile ..."
sbt -batch compile Test/compile > /tmp/preflight_sbt.log 2>&1 || {
  echo "[preflight] FAIL: compile broken — tail of /tmp/preflight_sbt.log:"
  tail -20 /tmp/preflight_sbt.log
  exit 1
}

echo "[preflight] sf0.001 smoke (SparkEntry.entry rows>0) ..."
tools/runmain.sh graft.Smoke /root/testdata/sf0.001 > /tmp/preflight_smoke.log 2>&1 || {
  echo "[preflight] FAIL: smoke query failed — tail of /tmp/preflight_smoke.log:"
  tail -20 /tmp/preflight_smoke.log
  exit 1
}
grep -q "SMOKE OK" /tmp/preflight_smoke.log || {
  echo "[preflight] FAIL: smoke did not print SMOKE OK"
  tail -20 /tmp/preflight_smoke.log
  exit 1
}
echo "[preflight] conformance stamp ..."
if [ ! -f artifacts/CONFORMANCE_LATEST.txt ]; then
  echo "[preflight] FAIL: artifacts/CONFORMANCE_LATEST.txt missing — run tools/run_conformance.sh"
  exit 1
fi
grep -q "^rc: 0$" artifacts/CONFORMANCE_LATEST.txt || {
  echo "[preflight] FAIL: last recorded conformance run was not green:"
  cat artifacts/CONFORMANCE_LATEST.txt
  exit 1
}
sed -n '1,3p' artifacts/CONFORMANCE_LATEST.txt | sed 's/^/[preflight]   /'

echo "[preflight] OK — compile green, smoke green, conformance stamp green. Safe to snapshot."
