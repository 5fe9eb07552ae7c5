#!/bin/bash
# Build the reference-Caffe parity oracle: compiles an unmodified subset of
# /root/reference's CPU sources (Net + the layer types the CPM deploy nets
# use) against local stub headers (no glog/gflags/boost/BLAS/HDF5 in this
# image — see stubs/), plus this directory's driver.  Output binary:
# $BUILD/ref_oracle.
#
# Usage: build.sh [BUILD_DIR]   (default /tmp/ref_oracle_build)
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${REF:-/root/reference}"
BUILD="${1:-/tmp/ref_oracle_build}"
mkdir -p "$BUILD/caffe/proto"

# 1. protobuf codegen (proto2 schema compiles fine under protoc 3.x)
protoc --cpp_out="$BUILD/caffe/proto" -I "$REF/src/caffe/proto" \
    "$REF/src/caffe/proto/caffe.proto"

CXX=${CXX:-g++}
FLAGS="-O2 -std=gnu++17 -DCPU_ONLY -w -fpermissive
  -I$HERE/stubs -I$BUILD -I$REF/include -I$REF/src"

SRCS="
$REF/src/caffe/blob.cpp
$REF/src/caffe/common.cpp
$REF/src/caffe/layer.cpp
$REF/src/caffe/layer_factory.cpp
$REF/src/caffe/net.cpp
$REF/src/caffe/syncedmem.cpp
$REF/src/caffe/util/math_functions.cpp
$REF/src/caffe/util/im2col.cpp
$REF/src/caffe/util/insert_splits.cpp
$REF/src/caffe/util/upgrade_proto.cpp
$REF/src/caffe/layers/input_layer.cpp
$REF/src/caffe/layers/base_conv_layer.cpp
$REF/src/caffe/layers/conv_layer.cpp
$REF/src/caffe/layers/deconv_layer.cpp
$REF/src/caffe/layers/im2col_layer.cpp
$REF/src/caffe/layers/neuron_layer.cpp
$REF/src/caffe/layers/relu_layer.cpp
$REF/src/caffe/layers/sigmoid_layer.cpp
$REF/src/caffe/layers/tanh_layer.cpp
$REF/src/caffe/layers/power_layer.cpp
$REF/src/caffe/layers/eltwise_layer.cpp
$REF/src/caffe/layers/pooling_layer.cpp
$REF/src/caffe/layers/lrn_layer.cpp
$REF/src/caffe/layers/softmax_layer.cpp
$REF/src/caffe/layers/concat_layer.cpp
$REF/src/caffe/layers/split_layer.cpp
$REF/src/caffe/layers/inner_product_layer.cpp
$REF/src/caffe/layers/slice_layer.cpp
$REF/src/caffe/layers/flatten_layer.cpp
$REF/src/caffe/layers/reshape_layer.cpp
$REF/src/caffe/layers/scale_layer.cpp
$REF/src/caffe/layers/bias_layer.cpp
$REF/src/caffe/layers/batch_norm_layer.cpp
$REF/src/caffe/layers/dropout_layer.cpp
$REF/src/caffe/layers/absval_layer.cpp
$REF/src/caffe/layers/bnll_layer.cpp
$REF/src/caffe/layers/elu_layer.cpp
$REF/src/caffe/layers/exp_layer.cpp
$REF/src/caffe/layers/log_layer.cpp
$REF/src/caffe/layers/threshold_layer.cpp
$REF/src/caffe/layers/prelu_layer.cpp
$REF/src/caffe/layers/mvn_layer.cpp
$REF/src/caffe/layers/argmax_layer.cpp
$REF/src/caffe/layers/crop_layer.cpp
$REF/src/caffe/layers/reduction_layer.cpp
$REF/src/caffe/layers/tile_layer.cpp
$REF/src/caffe/layers/embed_layer.cpp
$REF/src/caffe/layers/batch_reindex_layer.cpp
$REF/src/caffe/layers/loss_layer.cpp
$REF/src/caffe/layers/euclidean_loss_layer.cpp
$REF/src/caffe/layers/euclideanmask_loss_layer.cpp
$REF/src/caffe/layers/softmax_loss_layer.cpp
$REF/src/caffe/layers/sigmoid_cross_entropy_loss_layer.cpp
$REF/src/caffe/layers/hinge_loss_layer.cpp
$REF/src/caffe/layers/contrastive_loss_layer.cpp
$REF/src/caffe/layers/infogain_loss_layer.cpp
$REF/src/caffe/layers/multinomial_logistic_loss_layer.cpp
$REF/src/caffe/layers/maximum_layer.cpp
$REF/src/caffe/layers/parameter_layer.cpp
$REF/src/caffe/layers/dummy_data_layer.cpp
$REF/src/caffe/layers/recurrent_layer.cpp
$REF/src/caffe/layers/rnn_layer.cpp
$REF/src/caffe/layers/lstm_layer.cpp
$REF/src/caffe/layers/lstm_unit_layer.cpp
$REF/src/caffe/layers/spp_layer.cpp
$REF/src/caffe/layers/filter_layer.cpp
$REF/src/caffe/layers/accuracy_layer.cpp
$REF/src/caffe/layers/silence_layer.cpp
$REF/src/caffe/util/benchmark.cpp
$REF/src/caffe/solver.cpp
$REF/src/caffe/solvers/sgd_solver.cpp
$REF/src/caffe/solvers/nesterov_solver.cpp
$REF/src/caffe/solvers/adagrad_solver.cpp
$REF/src/caffe/solvers/rmsprop_solver.cpp
$REF/src/caffe/solvers/adadelta_solver.cpp
$REF/src/caffe/solvers/adam_solver.cpp
$HERE/cblas_naive.cpp
$HERE/hdf5_stubs.cpp
$HERE/io_lite.cpp
$HERE/main.cpp
$BUILD/caffe/proto/caffe.pb.cc
"

# the CPM DataTransformer needs OpenCV (resize/warpAffine/CLAHE); compile it
# against the system OpenCV 4 with a legacy-constant compat force-include
OPENCV_FLAGS="-DUSE_OPENCV -DREF_ORACLE_HAVE_OPENCV -I/usr/include/opencv4 -include $HERE/stubs/opencv_legacy.h"
OPENCV_LIBS="-lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_highgui"
SRCS="$SRCS
$REF/src/caffe/data_transformer.cpp
"

OBJS=""
for s in $SRCS; do
  o="$BUILD/$(basename "${s%.*}").o"
  extra=""
  case "$s" in
    */data_transformer.cpp|*/io_lite.cpp|*/main.cpp) extra="$OPENCV_FLAGS" ;;
  esac
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    echo "CXX $(basename $s)"
    $CXX $FLAGS $extra -c "$s" -o "$o"
  fi
  OBJS="$OBJS $o"
done

$CXX $OBJS -o "$BUILD/ref_oracle" -lprotobuf -lpthread $OPENCV_LIBS
echo "built $BUILD/ref_oracle"
