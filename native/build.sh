#!/usr/bin/env bash
# Build the native host-runtime shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libcclabel.so cc_label.cpp
echo "built $(pwd)/libcclabel.so"
