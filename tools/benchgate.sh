#!/bin/bash
# Bench artifact gate: run graft.Bench and refuse an unsettled measurement,
# the same way preflight.sh refuses a broken compile. An artifact taken
# under foreign load poisons the round's perf signal (same-binary totals
# measured 107 s settled vs 129 s under residue), so settled:false is a
# loud failure, not a silent annotation.
# Usage: tools/benchgate.sh [sf_dir]   (default /root/testdata/sf0.1)
#   exit 0  -> bench JSON on stdout, settled:true
#   exit 1  -> bench failed or settled:false (artifact printed for triage)
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"

OUT=/tmp/benchgate_out.json
SPARK_GRAFT_SF_DIR="$SF_DIR" tools/runmain.sh graft.Bench > "$OUT" 2>/tmp/benchgate_err.log || {
  echo "[benchgate] FAIL: bench run crashed — tail of /tmp/benchgate_err.log:" >&2
  tail -20 /tmp/benchgate_err.log >&2
  exit 1
}
LAST=$(grep '"settled"' "$OUT" | tail -1)
if [ -z "$LAST" ]; then
  echo "[benchgate] FAIL: no settled flag in bench output" >&2
  cat "$OUT" >&2
  exit 1
fi
if echo "$LAST" | grep -q '"settled":true'; then
  cat "$OUT"
  echo "[benchgate] OK — settled:true" >&2
else
  echo "[benchgate] FAIL: bench completed but settled:false — box under foreign" >&2
  echo "[benchgate] load; idle the machine and re-run. Artifact (do NOT ship):" >&2
  cat "$OUT" >&2
  exit 1
fi
