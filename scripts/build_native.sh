#!/bin/sh
# Build the native C++ components (rasterizer). No external deps; C ABI via ctypes.
set -e
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -std=c++17 -o ocrl_tpu/native/librasterizer.so \
    ocrl_tpu/native/rasterizer.cpp
echo "built ocrl_tpu/native/librasterizer.so"
