#!/bin/bash
# Round-4 TPU bench session: run every arm sequentially on an otherwise
# idle host (the chain-slope protocol requires it; see benchlib.py).
# Usage: tools/run_benches.sh <outdir>
set -u
OUT=${1:-/tmp/bench_r4}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_kmers_tpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.1

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/session.log"
  timeout 5400 python "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/session.log"
  cat "$OUT/$name.json"
}

run headline bench.py
run configs bench_configs.py
run minimizer bench_configs.py --minimizer
run stream bench_configs.py --stream
run lengths bench_configs.py --lengths
run generic bench_configs.py --generic
run ablate bench_configs.py --ablate
