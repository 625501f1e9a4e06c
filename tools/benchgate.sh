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
  # calib drift gate: the host can throttle sustained load MID-run, which
  # the pre-run settled verdict cannot see (observed: settled:true at 2×
  # the same binary's totals — plans/r13/bench_throttled_example.json).
  # Bench measures its calibration job at start AND end; a >1.6× drift in
  # either direction means part of the suite ran on a different-speed box
  # and the totals are not comparable to anything.
  DRIFT=$(echo "$LAST" | python3 -c '
import json, sys
d = json.loads(sys.stdin.readline())
a, b = d.get("calib_sec"), d.get("calib_end")
print("ok" if not a or not b or (max(a, b) / min(a, b)) <= 1.6 else "drift %.3f -> %.3f" % (a, b))
' 2>/dev/null || echo ok)
  if [ "$DRIFT" != "ok" ]; then
    echo "[benchgate] FAIL: settled:true but calibration drifted mid-run ($DRIFT)" >&2
    echo "[benchgate] — host throttled during the suite; re-run. Artifact (do NOT ship):" >&2
    cat "$OUT" >&2
    exit 1
  fi
  cat "$OUT"
  echo "[benchgate] OK — settled:true, calib stable" >&2
else
  echo "[benchgate] FAIL: bench completed but settled:false — box under foreign" >&2
  echo "[benchgate] load; idle the machine and re-run. Artifact (do NOT ship):" >&2
  cat "$OUT" >&2
  exit 1
fi
