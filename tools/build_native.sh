#!/bin/sh
# Build the native host runtime (ring FIFO + IQ writer + quantizer).
# Output: native/libgpssim_native.so  (path printed on success)
set -e
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SRC="$ROOT/native/gpssim_native.cc"
OUT="$ROOT/native/libgpssim_native.so"
if [ -f "$OUT" ] && [ "$OUT" -nt "$SRC" ]; then
  echo "$OUT"
  exit 0
fi
# -ffp-contract=off: the sequential-parity engine must perform exactly the
# IEEE-754 mul+add sequence the reference (built at -Og, baseline x86-64,
# no FMA) performs — FMA contraction would change the rounding.
# -march=native only widens the same ops to the host's vectors.
g++ -std=c++17 -O3 -march=native -ffp-contract=off -shared -fPIC -pthread \
  -o "$OUT" "$SRC"
echo "$OUT"
