#!/bin/bash
# Build the golden-vector oracle against an out-of-tree build of the
# reference's vendored MIRACL-core (reference source mounted read-only at
# $REF; a patched shadow copy for GCC-12 lives at $REFSRC, built in $BUILD).
# Nothing from the reference is copied into this repository — only the JSON
# vectors the oracle emits.
set -euo pipefail
REFSRC=${REFSRC:-/tmp/refsrc}
BUILD=${BUILD:-/tmp/refbuild}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=${OUT:-$HERE/../../tests/vectors}

g++ -std=c++17 -O1 -I"$REFSRC/3rd-party" \
    "$HERE/dump_vectors.cpp" "$BUILD/libcrypto12381.a" -o /tmp/dump_vectors
/tmp/dump_vectors > "$OUT/reference.json"
echo "wrote $OUT/reference.json"
