#!/bin/bash
# Build the GPU-kernel oracle (gpu_oracle): executes the reference's REAL
# CUDA postprocessing kernels — src/caffe/cpm/layers/nms_layer.cu and
# imresize_layer.cu, UNMODIFIED apart from cu_preprocess.py's purely
# syntactic <<<>>> launch rewrite — on the host via the cuda_emu shim.
#
# Unlike build.sh (CPU_ONLY), this binary compiles the minimal caffe core
# WITHOUT CPU_ONLY against stub CUDA headers (stubs/cuda/): "device" memory
# is host memory, so Blob::gpu_data()/SyncedMemory round-trips work and the
# Forward_gpu member functions run exactly as written.
#
# Usage: build_gpu.sh [BUILD_DIR]   (default /tmp/ref_oracle_build; objects
# go to BUILD_DIR/gpu to avoid ODR mixing with the CPU_ONLY objects)
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${REF:-/root/reference}"
BUILD="${1:-/tmp/ref_oracle_build}"
GPU="$BUILD/gpu"
mkdir -p "$GPU"

# proto codegen shared with the base oracle
if [ ! -f "$BUILD/caffe.pb.o" ]; then
  bash "$HERE/build.sh" "$BUILD"
fi

CXX=${CXX:-g++}
FLAGS="-O2 -std=gnu++17 -w -fpermissive
  -I$HERE/stubs -I$HERE/stubs/cuda -I$HERE -I$BUILD -I$REF/include -I$REF/src"
OPENCV_FLAGS="-I/usr/include/opencv4 -include $HERE/stubs/opencv_legacy.h"

# 1. rewrite the CUDA launch syntax (the only part g++ cannot parse)
for cu in nms_layer imresize_layer; do
  src="$REF/src/caffe/cpm/layers/$cu.cu"
  out="$GPU/${cu}_cu.cc"
  if [ ! -f "$out" ] || [ "$src" -nt "$out" ] \
      || [ "$HERE/cu_preprocess.py" -nt "$out" ]; then
    echo "CUPP $cu.cu"
    python3 "$HERE/cu_preprocess.py" "$src" "$out"
  fi
done

build() {  # build <src> <obj> [extra flags...]
  local src="$1" obj="$2"; shift 2
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CXX $(basename "$src")"
    $CXX $FLAGS "$@" -c "$src" -o "$obj"
  fi
}

CU_FLAGS="-include $HERE/cuda_emu.h"

build "$REF/src/caffe/blob.cpp"            "$GPU/blob.o"
build "$REF/src/caffe/syncedmem.cpp"       "$GPU/syncedmem.o"
build "$REF/src/caffe/common.cpp"          "$GPU/common.o"
build "$REF/src/caffe/layer.cpp"           "$GPU/layer.o"
build "$REF/src/caffe/util/math_functions.cpp" "$GPU/math_functions.o"
build "$REF/src/caffe/cpm/util/math_functions.cpp" "$GPU/cpm_math_functions.o"
build "$REF/src/caffe/cpm/layers/nms_layer.cpp" "$GPU/nms_layer.o"
build "$REF/src/caffe/cpm/layers/imresize_layer.cpp" "$GPU/imresize_layer.o" \
    $OPENCV_FLAGS
build "$GPU/nms_layer_cu.cc"      "$GPU/nms_layer_cu.o" $CU_FLAGS
build "$GPU/imresize_layer_cu.cc" "$GPU/imresize_layer_cu.o" $CU_FLAGS
build "$HERE/cuda_emu.cpp"        "$GPU/cuda_emu.o"
build "$HERE/gpu_support.cpp"     "$GPU/gpu_support.o"
build "$HERE/gpu_kernel_driver.cpp" "$GPU/gpu_kernel_driver.o"

$CXX "$GPU"/blob.o "$GPU"/syncedmem.o "$GPU"/common.o "$GPU"/layer.o \
  "$GPU"/math_functions.o "$GPU"/cpm_math_functions.o \
  "$GPU"/nms_layer.o "$GPU"/imresize_layer.o \
  "$GPU"/nms_layer_cu.o "$GPU"/imresize_layer_cu.o \
  "$GPU"/cuda_emu.o "$GPU"/gpu_support.o "$GPU"/gpu_kernel_driver.o \
  "$BUILD"/caffe.pb.o "$BUILD"/cblas_naive.o \
  -o "$BUILD/gpu_oracle" -lprotobuf -lpthread \
  -lopencv_core -lopencv_imgproc
echo "built $BUILD/gpu_oracle"
