#!/bin/sh
# Build the reference zhpsm matcher (compiled straight from the
# read-only checkout at $REF — nothing is copied into this repo) plus
# our baseline driver. Produces tools/ref/ref_odometry.
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
g++ -O2 -std=c++11 -I"$REF/src/zhpsm" \
  "$HERE/ref_odometry.cpp" \
  "$REF/src/zhpsm/ZHPolar_Match.cpp" \
  "$REF/src/zhpsm/point.cpp" \
  -o "$HERE/ref_odometry"
echo "built $HERE/ref_odometry"
