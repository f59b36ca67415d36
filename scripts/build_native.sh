#!/bin/sh
# Build the native loader shared library.
# Compile to a temp path and rename: rename(2) is atomic, so a concurrent
# process that stats the .so never observes a half-written library.
set -e
cd "$(dirname "$0")/.."
mkdir -p tpuimg/_native
g++ -O2 -shared -fPIC -std=c++17 native/loader.cpp \
    -lpng16 -ljpeg -pthread \
    -o "tpuimg/_native/libtpuimg.so.tmp.$$"
mv -f "tpuimg/_native/libtpuimg.so.tmp.$$" tpuimg/_native/libtpuimg.so
echo "built tpuimg/_native/libtpuimg.so"
