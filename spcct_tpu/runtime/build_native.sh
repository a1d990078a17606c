#!/bin/sh
# Build the native host-data engine (optional accelerator; see native.py).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libspcct_data.so spcct_data.cpp
echo "built $(pwd)/libspcct_data.so"
