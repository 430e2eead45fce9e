#!/usr/bin/env bash
# One-shot driver for the TPU work deferred while the device tunnel was
# down (round 2): per-stage profiling, pallas-vs-fused kernel A/B, and
# the realtime loopback contract on the real chip. Run from the repo
# root when `python -c "import jax; print(jax.devices())"` shows a TPU.
#
# Results land in /tmp/tpu_deferred/; afterwards, if the fused variant
# wins, flip the default (ops/synth_jax.py JaxBlockSynth fuse_a /
# bench.py BENCH_KERNEL) and update PERFORMANCE.md with the numbers.
set -uo pipefail
cd "$(dirname "$0")/.."
REPO=$(pwd)
OUT=${1:-/tmp/tpu_deferred}
mkdir -p "$OUT"

echo "== device check"
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU not reachable; aborting"; exit 1; }

echo "== per-stage timing (A2 vs pallas B vs fused) -> $OUT/stages.log"
timeout 3000 python tools/profile_stages.py 2>&1 | tee "$OUT/stages.log"

echo "== bench: pallas kernel -> $OUT/bench_pallas.json"
timeout 3000 python bench.py 2>"$OUT/bench_pallas.err" | tee "$OUT/bench_pallas.json"

echo "== bench: fused kernel -> $OUT/bench_fused.json"
BENCH_KERNEL=fused timeout 3000 python bench.py 2>"$OUT/bench_fused.err" | tee "$OUT/bench_fused.json"

echo "== fleet aggregate throughput on the chip -> $OUT/fleet.log"
(cd "$OUT" && timeout 1800 python "$REPO/examples/fleet_generate.py" \
    "$REPO/fixtures/brdc_test.22n" 8 2>&1 | tee fleet.log | tail -2)

echo "== realtime loopback contract on the chip"
GPSSIM_TEST_TPU=1 timeout 1200 python -m pytest tests/test_sinks.py -q \
    -k "realtime" 2>&1 | tee "$OUT/realtime.log" | tail -3

echo "== done; compare bench_pallas.json vs bench_fused.json"
