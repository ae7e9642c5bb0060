#!/usr/bin/env bash
# AddressSanitizer gate for the native library (the reference's analogue is
# hardening flags + clang-tidy CI, SURVEY.md section 5.2; this actually
# executes the C++ under ASAN). Builds an instrumented _bamio.so, points the
# on-demand loader at it, and runs the native-touching test files.
set -euo pipefail
cd "$(dirname "$0")/.."

ASAN_SO=$(g++ -print-file-name=libasan.so)
OUT=$(mktemp -d)/_bamio_asan.so
g++ -O1 -g -std=c++17 -shared -fPIC -fsanitize=address \
    genome_downsampler_tpu/io/csrc/*.cpp -o "$OUT" -lz -lpthread

# GD_BAMIO_SO overrides the build cache (io/build.py); leak detection is
# disabled because the CPython interpreter itself reports leaks at exit.
# A standalone driver is used instead of pytest: scipy/jax wheels abort
# under ASAN's interceptors, while the native paths themselves are clean.
LD_PRELOAD="$ASAN_SO" \
ASAN_OPTIONS=detect_leaks=0 \
GD_BAMIO_SO="$OUT" \
python -u scripts/asan_exercise.py
