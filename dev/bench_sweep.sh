#!/bin/bash
# Serve-perf sweep on the real chip: batch size x XLA flags x quantize mode.
# Each config is its own process (XLA_FLAGS must be set before jax init).
# Run from repo root: bash dev/bench_sweep.sh
cd /root/repo
run() {
  echo "=== $* ==="
  env "$@" python bench.py 2>&1 | tail -2
}
run BENCH_BATCH=128 BENCH_QUANTIZE=int8
run BENCH_BATCH=256 BENCH_QUANTIZE=int8
run BENCH_BATCH=128 BENCH_QUANTIZE=int8 XLA_FLAGS=--xla_tpu_enable_latency_hiding_scheduler=true
run BENCH_BATCH=128 BENCH_QUANTIZE=none XLA_FLAGS=--xla_tpu_enable_latency_hiding_scheduler=true
echo "sweep done"
