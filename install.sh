#!/usr/bin/env bash
# One-shot setup (analog of the reference's install_caffe_and_cpm.sh):
# install deps, build the native host libraries, run the test suite,
# and fetch the released caffemodels if a URL source is reachable.
set -euo pipefail
cd "$(dirname "$0")"

python -c "import jax" 2>/dev/null || pip install "jax[cpu]" flax optax einops numpy h5py pytest opencv-python-headless

make native

# Released CPM weights (same files the reference's model/getModels.sh pulls).
# Skipped silently when offline; the framework runs with random init.
fetch() {
  [ -f "$2" ] && return 0
  curl -fsSL --retry 2 -o "$2" "$1" 2>/dev/null || \
    echo "note: could not fetch $(basename "$2") (offline?); skipping"
}
mkdir -p model/coco model/mpi
fetch http://posefs1.perception.cs.cmu.edu/Results/RTPose/pose_iter_440000.caffemodel model/coco/pose_iter_440000.caffemodel
fetch http://posefs1.perception.cs.cmu.edu/Results/RTPose/pose_iter_160000.caffemodel model/mpi/pose_iter_160000.caffemodel

python -m pytest tests/ -x -q
echo "caffe_rtpose_tpu ready."
