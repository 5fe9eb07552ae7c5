#!/bin/bash
# Build the render oracle (render_oracle): executes the reference's REAL
# CUDA render kernels — src/rtpose/renderFunctions.cu, UNMODIFIED apart
# from cu_preprocess.py's purely syntactic <<<>>> launch rewrite — on the
# host via the cuda_emu shim, through the same host wrappers rtpose.cpp's
# render() calls.  Reuses build_gpu.sh's objects (cuda_emu, gpu_support,
# caffe cpm math for caffe::updiv).
#
# Usage: build_render.sh [BUILD_DIR]   (default /tmp/ref_oracle_build)
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${REF:-/root/reference}"
BUILD="${1:-/tmp/ref_oracle_build}"
GPU="$BUILD/gpu"

# shared objects (cuda_emu, gpu_support, caffe core, proto) from the
# GPU-kernel oracle build
if [ ! -f "$GPU/cuda_emu.o" ] || [ ! -f "$GPU/cpm_math_functions.o" ]; then
  bash "$HERE/build_gpu.sh" "$BUILD"
fi

CXX=${CXX:-g++}
FLAGS="-O2 -std=gnu++17 -w -fpermissive
  -I$HERE/stubs -I$HERE/stubs/cuda -I$HERE -I$BUILD -I$REF/include -I$REF/src"

src="$REF/src/rtpose/renderFunctions.cu"
out="$GPU/renderFunctions_cu.cc"
if [ ! -f "$out" ] || [ "$src" -nt "$out" ] \
    || [ "$HERE/cu_preprocess.py" -nt "$out" ]; then
  echo "CUPP renderFunctions.cu"
  python3 "$HERE/cu_preprocess.py" "$src" "$out"
fi

build() {  # build <src> <obj> [extra flags...]
  local src="$1" obj="$2"; shift 2
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CXX $(basename "$src")"
    $CXX $FLAGS "$@" -c "$src" -o "$obj"
  fi
}

build "$GPU/renderFunctions_cu.cc" "$GPU/renderFunctions_cu.o" \
    -include "$HERE/cuda_emu.h"
build "$HERE/render_driver.cpp" "$GPU/render_driver.o"

$CXX "$GPU"/renderFunctions_cu.o "$GPU"/render_driver.o \
  "$GPU"/cuda_emu.o "$GPU"/gpu_support.o "$GPU"/common.o \
  "$GPU"/math_functions.o "$GPU"/cpm_math_functions.o \
  "$BUILD"/caffe.pb.o "$BUILD"/cblas_naive.o \
  -o "$BUILD/render_oracle" -lprotobuf -lpthread
echo "built $BUILD/render_oracle"
