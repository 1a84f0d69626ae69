#!/bin/sh
# Build the detex_tpu native host library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -shared -fPIC detex_host.cpp \
    -o libdetex_host.so
echo "built $(pwd)/libdetex_host.so"
