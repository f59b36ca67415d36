#!/bin/sh
# Build the native loader shared library.
set -e
cd "$(dirname "$0")/.."
mkdir -p tpuimg/_native
g++ -O2 -shared -fPIC -std=c++17 native/loader.cpp \
    -lpng16 -ljpeg -pthread \
    -o tpuimg/_native/libtpuimg.so
echo "built tpuimg/_native/libtpuimg.so"
