#!/usr/bin/env bash
# Build the native data loader shared library.
set -e
cd "$(dirname "$0")/../native"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    dataloader.cc -o libcaduceus_data.so
echo "built native/libcaduceus_data.so"
