#!/bin/bash
# Build the native data loader → cpp/build/libaxcnn_loader.so
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -std=c++17 -shared -fPIC -Wall \
    loader.cpp -o build/libaxcnn_loader.so -ljpeg -lpthread
echo "built $(pwd)/build/libaxcnn_loader.so"
