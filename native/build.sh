#!/usr/bin/env bash
# Build the native host-runtime shared libraries.
# (ucod_dpl_tpu.utils.native also auto-rebuilds these on import when the
# source is newer than the .so — this script is the manual/CI entry point.)
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libcclabel.so cc_label.cpp
g++ -O3 -march=native -shared -fPIC -o libmetrics.so metrics_kernel.cpp
g++ -O3 -march=native -shared -fPIC -o libimagepipe.so imagepipe.cpp -ljpeg -lpng
echo "built $(pwd)/{libcclabel,libmetrics,libimagepipe}.so"
