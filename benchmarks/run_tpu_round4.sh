#!/usr/bin/env bash
# Round-4 real-TPU measurement pass (sequential; never two heavy
# processes).  Run AFTER the planes 'auto' routing flip so bench/config5
# reflect the shipping configuration.
#
#   bash benchmarks/run_tpu_round4.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r4}"
mkdir -p "$LOG"

echo "== 1/3 config5 N=1e6 single chip =="
timeout 3600 python -u benchmarks/configs.py config5 \
  2>&1 | tee "$LOG/config5.log"

echo "== 2/3 bench.py headline (run 1) =="
timeout 3600 python -u bench.py 2>&1 | tee "$LOG/bench1.log"

echo "== 3/3 bench.py fleet-metric variance (runs 2-3) =="
timeout 3600 python -u bench.py 2>&1 | tee "$LOG/bench2.log"
timeout 3600 python -u bench.py 2>&1 | tee "$LOG/bench3.log"

echo "ALL DONE -> $LOG"
