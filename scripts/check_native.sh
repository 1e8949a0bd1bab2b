#!/bin/bash
# ASAN/UBSAN harness for the native oracle (SURVEY.md §5.2: the reference
# had no sanitizer coverage; we run the scalar pipeline under both).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O1 -g -std=c++17 -fsanitize=address,undefined -fno-omit-frame-pointer \
    -DTB_SELFTEST native/*.cpp -o build/selftest_asan
./build/selftest_asan
echo "native sanitizer check: PASS"
