#!/usr/bin/env bash
# Round-5 real-TPU measurement pass (sequential; never two heavy
# processes).  Reflects the shipping fused-slab routing.
#
#   bash benchmarks/run_tpu_round5.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r5}"
mkdir -p "$LOG"

echo "== 1/4 fused slab A/B (J=2, N=1e5) =="
timeout 2400 python -u benchmarks/probe_slab_tpu.py 2>&1 | tee "$LOG/slab.log"

echo "== 2/4 config5 N=1e6 single chip =="
timeout 3600 python -u benchmarks/configs.py config5 2>&1 | tee "$LOG/config5.log"

echo "== 3/4 bench.py headline (runs 1-2) =="
timeout 3000 python -u bench.py 2>&1 | tee "$LOG/bench1.log"
timeout 3000 python -u bench.py 2>&1 | tee "$LOG/bench2.log"

echo "== 4/4 fleet ESS variance (3 seeds) =="
timeout 3600 python -u benchmarks/fleet_variance.py 2>&1 | tee "$LOG/fleet_var.log"

echo "ALL DONE -> $LOG"
