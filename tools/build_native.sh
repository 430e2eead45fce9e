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
g++ -std=c++17 -O3 -shared -fPIC -pthread -o "$OUT" "$SRC"
echo "$OUT"
