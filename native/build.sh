#!/bin/sh
# Build the native runtime components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O2 -std=c++17 -shared -fPIC -o lib/libtinman_timing.so \
    timing/tinman_timing.cpp
echo "built native/lib/libtinman_timing.so"
