#!/usr/bin/env bash
# One-shot real-TPU measurement pass for round 3 (run when the axon
# tunnel is up; each step sequential — never two heavy processes).
#
#   bash benchmarks/run_tpu_round3.sh [logdir]
#
# Steps:
#   1. planes-engine A/B probe (N=1e5, J=2 then J=4): decides whether
#      ops/planes_engine.py 'auto' routing flips on for TPU.
#   2. config5: N=1e6 single-chip loglik+grad throughput + peak memory.
#   3. bench.py: the headline number the driver records.
# config4 (NUTS/VI/SMC posterior agreement under the f64 island) is
# NOT here — it takes ~30+ min of sampler compiles; run it separately:
#   timeout 5400 python -u benchmarks/configs.py config4
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_r3}"
mkdir -p "$LOG"

echo "== 1/3 planes probe J=2 =="
timeout 2400 python -u benchmarks/probe_planes_tpu.py 100000 2 100 \
  2>&1 | tee "$LOG/planes_J2.log"
echo "== 1b/3 planes probe J=4 =="
timeout 2400 python -u benchmarks/probe_planes_tpu.py 100000 4 100 \
  2>&1 | tee "$LOG/planes_J4.log"

echo "== 1c/3 planes fleet probe (vmapped, N=3e4, C=32) =="
timeout 2400 python -u benchmarks/probe_planes_tpu.py fleet 30000 32 100 \
  2>&1 | tee "$LOG/planes_fleet.log"

echo "== 2/3 config5 N=1e6 =="
timeout 3600 python -u benchmarks/configs.py config5 \
  2>&1 | tee "$LOG/config5.log"

echo "== 3/3 bench.py =="
timeout 2400 python -u bench.py 2>&1 | tee "$LOG/bench.log"

echo "ALL DONE -> $LOG"
