#!/bin/sh
# Build the native EXR codec shared library.
# Usage: native/exr/build.sh [output.so]
set -e
cd "$(dirname "$0")"
OUT="${1:-libpcss_exr.so}"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread -o "$OUT" exr_codec.cpp -lz
echo "built $OUT"
