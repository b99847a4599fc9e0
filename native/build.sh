#!/bin/bash
# Build the native loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 loader.cpp -lpng -lpthread -o libslamloader.so
echo "built native/libslamloader.so"
