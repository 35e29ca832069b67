#!/bin/sh
# Build the native loader library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 loaders.cpp -o liblinevis_loaders.so
echo "built native/liblinevis_loaders.so"
