#!/bin/sh
# Build the reference engine as a headless golden-output oracle.
# Stages the unmodified reference sources next to our TUI/curl stubs
# (so #include "gui.h" resolves to the stub) and compiles with the
# reference's own dialect/optimization flags for identical f64 behavior.
set -e

REF=${REFERENCE_DIR:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
# Stage OUTSIDE the repo tree: the staged files are verbatim reference
# sources (that is the point of an oracle) and must never look like
# framework code.
BUILD=${1:-${TMPDIR:-/tmp}/gpssim-oracle-build}

if [ ! -f "$REF/gps.c" ]; then
    echo "reference sources not found at $REF" >&2
    exit 3
fi

mkdir -p "$BUILD/curl"
# Engine sources verbatim; fifo.c is NOT used — the reference's fifo_enqueue
# drops buffers under consumer lag (tail pointer never advances), which
# would corrupt golden files. fifo_impl.c implements the same fifo.h API
# correctly.
for f in gps.c gps.h gps-sim.h sdr.h fifo.h almanac.h almanac.c; do
    cp "$REF/$f" "$BUILD/"
done
cp "$HERE/gui.h" "$HERE/gui_stub.c" "$HERE/curl_stub.c" "$HERE/main_oracle.c" \
   "$HERE/fifo_impl.c" "$BUILD/"
cp "$HERE/curl/curl.h" "$BUILD/curl/"

# Integer-NCO variant: same sources with FLOAT_CARR_PHASE removed
# (gps.h:17), golden reference for the framework's --int-nco carrier mode.
mkdir -p "$BUILD/intnco/curl"
for f in gps.c gps-sim.h sdr.h fifo.h almanac.h almanac.c; do
    cp "$REF/$f" "$BUILD/intnco/"
done
sed '/#define FLOAT_CARR_PHASE/d' "$REF/gps.h" > "$BUILD/intnco/gps.h"
cp "$HERE/gui.h" "$HERE/gui_stub.c" "$HERE/curl_stub.c" "$HERE/main_oracle.c" \
   "$HERE/fifo_impl.c" "$BUILD/intnco/"
cp "$HERE/curl/curl.h" "$BUILD/intnco/curl/"

cd "$BUILD/intnco"
cc -std=c11 -Og -g -W -Wall -D_GNU_SOURCE -I. \
    gps.c fifo_impl.c almanac.c gui_stub.c curl_stub.c main_oracle.c \
    -o "$BUILD/gps-sim-oracle-intnco" -lm -lpthread -lz

cd "$BUILD"
cc -std=c11 -Og -g -W -Wall -D_GNU_SOURCE -I. \
    gps.c fifo_impl.c almanac.c gui_stub.c curl_stub.c main_oracle.c \
    -o gps-sim-oracle -lm -lpthread -lz
echo "$BUILD/gps-sim-oracle"
