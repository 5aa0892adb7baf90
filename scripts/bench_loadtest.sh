#!/bin/bash
# Load-sentinel self-test (round-12 task 1 "done" criterion).
#
# Runs graft.Bench twice at the given SF: once idle (producing the drift
# reference BENCH_FULL.json the second pass reads), once under synthetic
# IO + page-cache load (a dd writer loop plus a cold-read loop that drops
# the page cache) — the interference mode that inflated ~25 rows 3–50×
# in the round-11 graded run while the CPU-light control stayed clean.
# PASS = ≥90% of the rows whose loaded-run MIN sits >3× (and ≥0.4 s)
# above the idle median carry the bench's own load_suspect flag.
#
# Usage: scripts/bench_loadtest.sh [sfDir]   (default /root/testdata/sf0.01)
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
export SPARK_GRAFT_SF_DIR=$SF

echo "== pass 1: idle reference bench =="
sbt -batch "runMain graft.Bench" 2>/dev/null | grep -c '"metric"' >/dev/null
cp BENCH_FULL.json /tmp/bench_idle.json

echo "== starting synthetic IO/page-cache load =="
( while :; do dd if=/dev/zero of=/tmp/graft_loadfile bs=1M count=4096 \
    conv=fdatasync 2>/dev/null; done ) &
W1=$!
( while :; do cat /tmp/graft_loadfile >/dev/null 2>&1; sync;
    echo 1 > /proc/sys/vm/drop_caches 2>/dev/null || true; done ) &
W2=$!
cleanup() {
  kill "$W1" "$W2" 2>/dev/null || true
  rm -f /tmp/graft_loadfile
  git checkout -- BENCH_FULL.json 2>/dev/null || true
}
trap cleanup EXIT

echo "== pass 2: bench under load (reads pass 1 as drift reference) =="
sbt -batch "runMain graft.Bench" 2>/dev/null | grep -c '"metric"' >/dev/null
cp BENCH_FULL.json /tmp/bench_loaded.json

python3 - <<'EOF'
import json
idle = json.load(open('/tmp/bench_idle.json'))
load = json.load(open('/tmp/bench_loaded.json'))
ref, mins = idle['queries'], load['queries_min']
flagged = set(load['load_suspect'])
inflated = [q for q, mn in mins.items()
            if q in ref and mn > 3 * ref[q] and mn - ref[q] > 0.4]
caught = [q for q in inflated if q in flagged]
missed = sorted(set(inflated) - flagged)
rate = len(caught) / len(inflated) if inflated else 1.0
print(f"inflated>3x rows: {len(inflated)}, flagged: {len(caught)}, "
      f"catch rate {rate:.0%}")
if missed:
    print("missed:", missed)
print(f"load_suspect total: {len(flagged)}, "
      f"ref_drift: {len(load.get('ref_drift', []))}, "
      f"control_io: {load.get('control_io', [])}")
assert rate >= 0.9, "sentinel missed >10% of inflated rows"
print("PASS: sentinel catches sustained IO-shaped interference")
EOF
