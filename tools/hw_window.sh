#!/bin/bash
# Hardware measurement window: run the FULL evidence backlog in order,
# one TPU process at a time (the tunnel chip is single-client), with
# per-step logs under /tmp/hw_window/. Gate on the verify drive — if it
# fails, stop and read its log before burning the window.
#
# Usage: bash tools/hw_window.sh [outdir]   (default data_r3)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
OUT=${1:-data_r3}
LOGS=/tmp/hw_window
mkdir -p "$LOGS"
step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date -u)" | tee -a "$LOGS/summary.log"
  timeout "$t" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== $name exit=$rc $(date -u)" | tee -a "$LOGS/summary.log"
  return $rc
}

step verify 590 python -u tools/verify_tpu.py || {
  grep -q "FAILS: 0" "$LOGS/verify.log" || {
    echo "VERIFY FAILED — stopping (read $LOGS/verify.log; revert knobs:"
    echo "SPGEMM_META16=0 SPGEMM_DEVICE_COMBINE=0, or flip f64 routing)"
    exit 1
  }
}
step f64_cant 3000 python -u tools/measure_f64_cant.py
step suite_65536 14000 python -u tools/run_suite.py --outdir "$OUT"
step suite_8192 7000 python -u tools/run_suite.py --quick --outdir "$OUT"
step suite_262144 7000 python -u tools/run_suite.py --n 262144 \
  --only banded --outdir "$OUT"
step suite_f64 7000 python -u tools/run_suite.py --quick --dtype f64 \
  --outdir "$OUT"
step bench 2000 python -u bench.py
echo "WINDOW DONE $(date -u)" | tee -a "$LOGS/summary.log"
