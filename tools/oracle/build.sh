#!/bin/bash
# Build the golden-vector oracles against an out-of-tree build of the
# reference's vendored MIRACL-core (reference source mounted read-only at
# /root/reference; a patched shadow copy for GCC-12 lives at $REFSRC, built
# in $BUILD).  Nothing from the reference is copied into this repository —
# only the JSON vectors the oracles emit.
#
# To recreate the shadow build from scratch:
#   cp -r /root/reference/* $REFSRC && chmod -R u+w $REFSRC
#   for d in $REFSRC/examples/*/; do mv $d/CmakeLists.txt $d/CMakeLists.txt; done
#   # GCC-12 patches (static lib only; the example executables additionally
#   # need "deducing this" = GCC 14, so they are NOT built):
#   #  - random.hpp: create_random_engine constexpr -> inline
#   #  - algebra/data_access/zp_number.hpp: static operator() -> const member
#   #  - include/print: shim header for std::print/println
#   cmake -S $REFSRC -B $BUILD -DCMAKE_BUILD_TYPE=Release && make -C $BUILD crypto12381
set -euo pipefail
REFSRC=${REFSRC:-/tmp/refsrc}
BUILD=${BUILD:-/tmp/refbuild}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=${OUT:-$HERE/../../tests/vectors}

build() {
    g++ -std=c++17 -O1 -I"$REFSRC/3rd-party" \
        "$HERE/$1.cpp" "$BUILD/libcrypto12381.a" -o "/tmp/$1"
}

build dump_vectors
/tmp/dump_vectors > "$OUT/reference.json"
echo "wrote $OUT/reference.json"

build dump_ps_flow
/tmp/dump_ps_flow > "$OUT/ps_flow.json"
echo "wrote $OUT/ps_flow.json"

for s in bbs bbs_plus sss bbs04 ac_bbs ac_rbbs ac_rps mhac_bbs; do
    if [ -f "$HERE/dump_${s}_flow.cpp" ]; then
        build "dump_${s}_flow"
        "/tmp/dump_${s}_flow" > "$OUT/${s}_flow.json"
        echo "wrote $OUT/${s}_flow.json"
    fi
done
