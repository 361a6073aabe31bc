#!/usr/bin/env bash
# Build libvm_asr_native.so (C ABI, loaded via ctypes).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -ffast-math -shared -fPIC \
    -o lib/libvm_asr_native.so src/vm_asr_native.cpp src/flac_decoder.cpp
echo "built $(pwd)/lib/libvm_asr_native.so"
