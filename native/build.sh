#!/bin/sh
# Build the native host-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    t2onet_native.cpp -o libt2onet_native.so
echo "built $(pwd)/libt2onet_native.so"
