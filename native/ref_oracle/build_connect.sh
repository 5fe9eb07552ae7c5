#!/bin/bash
# Build the reference limb-assembly oracle (ref_connect): compiles the
# UNMODIFIED examples/rtpose/rtpose.cpp (CPU-only, stub headers, main()
# renamed away) + the rtpose model-descriptor sources + the CPM layer CPU
# implementations, links them against the base oracle's caffe objects and
# this directory's connect_driver.cpp.  Run build.sh first (or let this
# script do it) so the shared objects exist.
#
# Usage: build_connect.sh [BUILD_DIR]   (default /tmp/ref_oracle_build)
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${REF:-/root/reference}"
BUILD="${1:-/tmp/ref_oracle_build}"

[ -f "$BUILD/net.o" ] || bash "$HERE/build.sh" "$BUILD"

CXX=${CXX:-g++}
FLAGS="-O2 -std=gnu++17 -DCPU_ONLY -w -fpermissive
  -I$HERE/stubs -I$BUILD -I$REF/include -I$REF/src -I/usr/include/opencv4"
RTPOSE_FLAGS="-include $HERE/stubs/rtpose_compat.h"

build() {  # build <src> <obj> [extra flags...]
  local src="$1" obj="$2"; shift 2
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CXX $(basename "$src")"
    $CXX $FLAGS "$@" -c "$src" -o "$obj"
  fi
}

build "$REF/examples/rtpose/rtpose.cpp" "$BUILD/rtpose.o" \
    $RTPOSE_FLAGS -Dmain=rtpose_disabled_main
build "$REF/src/rtpose/modelDescriptor.cpp" "$BUILD/modelDescriptor.o"
build "$REF/src/rtpose/modelDescriptorFactory.cpp" \
    "$BUILD/modelDescriptorFactory.o"
build "$REF/src/caffe/cpm/layers/imresize_layer.cpp" \
    "$BUILD/imresize_layer.o" -include "$HERE/stubs/opencv_legacy.h"
build "$REF/src/caffe/cpm/layers/nms_layer.cpp" "$BUILD/nms_layer.o"
build "$HERE/connect_driver.cpp" "$BUILD/connect_driver.o" $RTPOSE_FLAGS
build "$HERE/producer_driver.cpp" "$BUILD/producer_driver.o" $RTPOSE_FLAGS

# every base-oracle object except its own main and the per-binary drivers
OBJS=""
for o in "$BUILD"/*.o; do
  case "$(basename "$o")" in
    main.o|connect_driver.o|producer_driver.o) ;;
    *) OBJS="$OBJS $o" ;;
  esac
done

LIBS="-lprotobuf -lpthread
  -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_highgui
  -lopencv_videoio"
$CXX $OBJS "$BUILD/connect_driver.o" -o "$BUILD/ref_connect" $LIBS
echo "built $BUILD/ref_connect"
# same reference objects, different driver: runs the ACTUAL image-dir
# producer (getFrameFromDir/process_and_pad_image) instead of connectLimbs
$CXX $OBJS "$BUILD/producer_driver.o" -o "$BUILD/ref_producer" $LIBS
echo "built $BUILD/ref_producer"
