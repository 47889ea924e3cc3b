#!/bin/bash
# Gated measurement batch: probe until the (shared, tunnel-backed) TPU
# answers, then run the full round measurement sequence. Use this instead
# of blocking an interactive session on the pool: outages of an hour+ are
# normal here (CLAUDE.md "Environment quirks").
#
#   setsid nohup scripts/gated_batch.sh > .rNlogs/batch.log 2>&1 &
#
# Each stage runs under `timeout` and tees its full log under $LOGDIR so a
# wedged stage can't eat the batch and every number is auditable later.
# Stages match the perf-facts methodology (amortized in-jit, K>=30).
set -u
cd "$(dirname "$0")/.."
export HTPU_COMPILE_CACHE="${HTPU_COMPILE_CACHE:-$PWD/.jit_cache}"
# COMMITTED log directory: round 3's numbers lived in a gitignored
# .r3logs/ and were lost to a clean checkout (VERDICT r3 missing #2).
LOGDIR="${LOGDIR:-$PWD/perflogs}"
mkdir -p "$LOGDIR"

echo "[gate] probing for TPU, $(date -u +%H:%M:%S)"
for i in $(seq 1 400); do
  if timeout 120 python -c "import jax,jax.numpy as jnp; (jnp.arange(8)+1).block_until_ready()" >/dev/null 2>&1; then
    echo "[gate] TPU up after $i probes, $(date -u +%H:%M:%S)"; break
  fi
  sleep 45
done

echo "=== chip_check quick ==="
timeout 2400 python -u scripts/chip_check.py 2>&1 | tee "$LOGDIR/chip_check.log" | tail -6
echo "=== perf_hist 16 ==="
timeout 1800 python -u scripts/perf_hist.py 16 2>&1 | tee "$LOGDIR/perf_hist.log" | tail -8
echo "=== perf_encode 16 ==="
timeout 2400 python -u scripts/perf_encode.py 16 2>&1 | tee "$LOGDIR/perf_encode.log" | tail -25
echo "=== perf_tiers 16 ==="
timeout 2400 python -u scripts/perf_tiers.py 16 2>&1 | tee "$LOGDIR/perf_tiers.log" | tail -15
echo "=== decode multi sweep, 32 MiB 3k alphabet ==="
for m in 2 3 4; do
  timeout 1800 python -u scripts/perf_decode.py 32 3000 "$m" 2>&1 | tail -2 | tee -a "$LOGDIR/decode_multi.log"
done
echo "=== v3-ceiling ablations (fold / win2), 32 MiB multi=3 ==="
for a in fold win2 "fold,win2"; do
  echo "--- HTPU_ABLATE=$a ---" | tee -a "$LOGDIR/decode_ablate.log"
  HTPU_ABLATE=$a timeout 1800 python -u scripts/perf_decode.py 32 3000 3 2>&1 | tail -2 | tee -a "$LOGDIR/decode_ablate.log"
done
echo "=== headline bench ==="
timeout 2400 python -u bench.py 2>&1 | tee "$LOGDIR/bench.log" | grep metric
echo "=== chip sweep ==="
timeout 5400 python -u scripts/chip_check.py --sweep 5 2>&1 | tee "$LOGDIR/chip_sweep.log" | tail -4
echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
