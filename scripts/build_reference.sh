#!/usr/bin/env bash
# Build the reference darknet (ArtyZe/yolo_quantization) out-of-tree.
#
# /root/reference is read-only, so we replicate its Makefile
# (reference Makefile:1-117) with objects + binary under build/ref/.
# CPU-only, QUANTIZATION=1 — the flagship uint8 integer-inference build
# (SURVEY.md mode 2). Used by scripts/parity_c.py and tests/test_parity_c.py
# to prove cross-binary parity.
set -euo pipefail

REF=${REF:-/root/reference}
OUT=${OUT:-$(dirname "$0")/../build/ref}
mkdir -p "$OUT/obj" "$OUT/backup" "$OUT/results"
OUT=$(cd "$OUT" && pwd)

CC=gcc
# -O2 (not the reference Makefile's -Ofast): -ffast-math licenses reciprocal
# and reassociation rewrites that change float results in the last ulp, which
# would break the bit-exact C-twin comparison (parity is about semantics, not
# compiler flags).
CFLAGS="-Wall -Wno-unused-result -Wno-unknown-pragmas -Wfatal-errors -fPIC -O2 -DQUANTIZATION"
# The reference's include/unistd.h is a Windows shim that would shadow the
# system header on Linux; stage only the real headers into our own dir.
mkdir -p "$OUT/include"
cp -u "$REF/include/darknet.h" "$REF/include/gettimeofday.h" "$OUT/include/"
COMMON="-I$OUT/include/ -I$REF/src/"
LDFLAGS="-lm -pthread"

# Same OBJ list as reference Makefile:98 (CPU build).
OBJ="gemm utils cuda deconvolutional_layer convolutional_layer image activations
im2col col2im blas crop_layer dropout_layer maxpool_layer softmax_layer data matrix
network connected_layer parser option_list detection_layer route_layer upsample_layer
box normalization_layer avgpool_layer layer local_layer shortcut_layer logistic_layer
activation_layer batchnorm_layer region_layer reorg_layer tree l2norm_layer yolo_layer
image_opencv list"
EXECOBJ="segmenter detector darknet"

compile() { # name srcdir
  local name=$1 dir=$2 src ext=c
  src="$REF/$dir/$name.c"
  [ -f "$src" ] || { src="$REF/$dir/$name.cpp"; ext=cpp; }
  [ -f "$src" ] || { echo "skip $name (no source)"; return 0; }
  local obj="$OUT/obj/$name.o"
  if [ "$obj" -nt "$src" ]; then return 0; fi
  if [ "$ext" = cpp ]; then
    g++ $COMMON $CFLAGS -c "$src" -o "$obj"
  else
    $CC $COMMON $CFLAGS -c "$src" -o "$obj"
  fi
  echo "CC $name"
}

for o in $OBJ; do compile "$o" src; done
for o in $EXECOBJ; do compile "$o" examples; done

OBJS=""
for o in $OBJ $EXECOBJ; do
  [ -f "$OUT/obj/$o.o" ] && OBJS="$OBJS $OUT/obj/$o.o"
done

$CC $COMMON $CFLAGS $OBJS -o "$OUT/darknet" $LDFLAGS
echo "built $OUT/darknet"

# parity shim: our test harness linked against the reference objects
LIBOBJS=""
for o in $OBJ; do
  [ -f "$OUT/obj/$o.o" ] && LIBOBJS="$LIBOBJS $OUT/obj/$o.o"
done
SHIM_SRC="$(cd "$(dirname "$0")/.." && pwd)/native/parity_shim.c"
$CC $COMMON $CFLAGS "$SHIM_SRC" $LIBOBJS -o "$OUT/parity_shim" $LDFLAGS
echo "built $OUT/parity_shim"
