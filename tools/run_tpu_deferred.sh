#!/usr/bin/env bash
# One-shot driver for TPU work deferred while the device tunnel was down.
# r5 backlog: the tunnel went UNAVAILABLE mid-round (backend init hung
# then errored), deferring the 50-member fleet revalidation and the
# on-chip realtime sink tests. Run from the repo root when
# `python -c "import jax; print(jax.devices())"` shows a TPU.
#
# Results land in /tmp/tpu_deferred/.
set -uo pipefail
cd "$(dirname "$0")/.."
REPO=$(pwd)
OUT=${1:-/tmp/tpu_deferred}
mkdir -p "$OUT"

echo "== device check"
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU not reachable; aborting"; exit 1; }

echo "== bench (full artifact incl. realtime-device + fleet sections)"
timeout 3000 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json"

echo "== 50-member fleet at scale (qa-verified per member)"
GPSSIM_TEST_TPU=1 GPSSIM_FLEET50=1 timeout 8000 python -m pytest \
    tests/test_fleet.py::test_fleet_50_members_at_scale -q -s \
    2>&1 | tee "$OUT/fleet50.log" | tail -4

echo "== realtime loopback contract on the chip"
GPSSIM_TEST_TPU=1 timeout 1800 python -m pytest tests/test_sinks.py -q \
    -k "realtime" 2>&1 | tee "$OUT/realtime.log" | tail -3

echo "== per-stage kernel timing"
timeout 3000 python tools/profile_stages.py 2>&1 | tee "$OUT/stages.log" | tail -5

echo "== done; see $OUT"
