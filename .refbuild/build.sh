#!/bin/bash
# Compile the read-only reference (mapbox/tippecanoe at /root/reference)
# into this gitignored dir for the golden parity comparisons.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
SRC=/root/reference
BUILD="$HERE/src"
rm -rf "$BUILD"
mkdir -p "$BUILD"
cp -r "$SRC"/. "$BUILD"/
chmod -R u+w "$BUILD"
make -C "$BUILD" -j"$(nproc)" tippecanoe tippecanoe-decode tile-join tippecanoe-enumerate tippecanoe-json-tool
for b in tippecanoe tippecanoe-decode tile-join tippecanoe-enumerate tippecanoe-json-tool; do
  cp "$BUILD/$b" "$HERE/$b"
done
# clean_or_clip_poly probe harness (byte oracle for core/polyclean + core/wagyu)
g++ -std=c++11 -O3 -DNDEBUG -I"$BUILD" -o "$HERE/clean_test" "$HERE/clean_test.cpp" \
  "$BUILD/geometry.o" "$BUILD/projection.o" -lm -lz -lsqlite3 -lpthread
echo "built: $HERE"
