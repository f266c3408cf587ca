#!/bin/bash
# Build the native data loader → cpp/build/libaxcnn_loader.so
#
# Sanitizer configs (SURVEY.md §5.2 — race/memory checking for the only
# first-party native code):
#   cpp/build.sh tsan   → libaxcnn_loader_tsan.so  (-fsanitize=thread)
#   cpp/build.sh asan   → libaxcnn_loader_asan.so  (-fsanitize=address)
# Load them via AXCNN_LOADER_SO=<path> (see axcnn/data/cpp_loader.py).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
MODE="${1:-release}"
case "$MODE" in
  release)
    g++ -O3 -march=native -std=c++17 -shared -fPIC -Wall \
        loader.cpp autoaugment.cpp -o build/libaxcnn_loader.so -ljpeg -lpthread ;;
  tsan)
    g++ -O1 -g -std=c++17 -shared -fPIC -Wall -fsanitize=thread \
        loader.cpp autoaugment.cpp -o build/libaxcnn_loader_tsan.so -ljpeg -lpthread ;;
  asan)
    g++ -O1 -g -std=c++17 -shared -fPIC -Wall -fsanitize=address \
        loader.cpp autoaugment.cpp -o build/libaxcnn_loader_asan.so -ljpeg -lpthread ;;
  test-tsan)
    g++ -O1 -g -std=c++17 -Wall -fsanitize=thread \
        loader.cpp autoaugment.cpp loader_test.cpp \
        -o build/loader_test_tsan -ljpeg -lpthread ;;
  test-asan)
    g++ -O1 -g -std=c++17 -Wall -fsanitize=address \
        loader.cpp autoaugment.cpp loader_test.cpp \
        -o build/loader_test_asan -ljpeg -lpthread ;;
  *) echo "unknown mode $MODE (release|tsan|asan|test-tsan|test-asan)" >&2; exit 2 ;;
esac
echo "built mode=$MODE in $(pwd)/build/"
