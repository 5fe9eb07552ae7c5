# Build/test entry points (reference Makefile:450-533 equivalents).
# The Python package needs no build; native host libraries are compiled
# on demand by caffe_rtpose_tpu/native.py, or explicitly via `make native`.

PY ?= python
CXX ?= g++
CXXFLAGS ?= -O2 -shared -fPIC -std=c++17

NATIVE_SRCS := $(wildcard native/*.cpp)
NATIVE_LIBS := $(patsubst native/%.cpp,native/lib%.so,$(NATIVE_SRCS))

.PHONY: all native test runtest pytest bench lint clean fetch-models

# Released CPM weights — the reference's exact getModels.sh:3 URLs.  Retries
# harder than install.sh; tests/test_real_weights_smoke.py activates
# automatically once the files exist.  One-command north-star runbook
# (fetch -> checksum pin -> smoke -> val2014_1k eval): scripts/north_star.sh
MODEL_HOST := http://posefs1.perception.cs.cmu.edu/Users/tsimon/Projects/coco/data/models
fetch-models:
	mkdir -p model/coco model/mpi
	curl -fSL --retry 5 --retry-delay 3 -o model/coco/pose_iter_440000.caffemodel $(MODEL_HOST)/coco/pose_iter_440000.caffemodel
	curl -fSL --retry 5 --retry-delay 3 -o model/mpi/pose_iter_160000.caffemodel $(MODEL_HOST)/mpi/pose_iter_160000.caffemodel

all: native

native: $(NATIVE_LIBS)

native/lib%.so: native/%.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

# `make runtest` parity: the aggregated suite on an 8-device virtual mesh
test runtest pytest:
	$(PY) -m pytest tests/ -x -q

# Sharded suite for small boxes / per-shard timeouts: each invocation is
# sized to finish well inside a 10-minute shard on ONE loaded CPU (measured
# wall times per shard in docs/testing.md).  Tiers are assigned per-file in
# tests/conftest.py.  Fails fast per shard; shards are independent.
runtest-shards:
	$(PY) -m pytest tests/ -q -m unit
	$(PY) -m pytest tests/ -q -m oracle
	$(PY) -m pytest tests/test_ref_composed_e2e.py -q -k production
	$(PY) -m pytest tests/test_ref_composed_e2e.py -q -k "three_scales or mpi"
	$(PY) -m pytest tests/test_estimator.py tests/test_optimized_path.py -q
	$(PY) -m pytest tests/test_pipeline.py tests/test_pp.py -q
	$(PY) -m pytest tests/test_ref_parity.py tests/test_ref_fuzz_parity.py -q
	$(PY) -m pytest tests/test_ref_render_parity.py tests/test_matlab_demos.py -q
	$(PY) -m pytest tests/test_ref_image_e2e.py -q
	$(PY) -m pytest tests/test_eval_and_parallel.py -q

bench:
	$(PY) bench.py

lint:
	$(PY) -m compileall -q caffe_rtpose_tpu tests bench.py __graft_entry__.py

clean:
	rm -f native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
