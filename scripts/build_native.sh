#!/bin/sh
# Build the native components into glio_tpu/native/.
set -e
cd "$(dirname "$0")/.."
mkdir -p glio_tpu/native
g++ -O2 -shared -fPIC -std=c++17 -o glio_tpu/native/librinex_fast.so \
    native/rinex_fast.cpp
echo "built glio_tpu/native/librinex_fast.so"
