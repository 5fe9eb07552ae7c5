# Build/test entry points (reference Makefile:450-533 equivalents).
# The Python package needs no build; native host libraries are compiled
# on demand by caffe_rtpose_tpu/native.py, or explicitly via `make native`.

PY ?= python
CXX ?= g++
CXXFLAGS ?= -O2 -shared -fPIC -std=c++17

NATIVE_SRCS := $(wildcard native/*.cpp)
NATIVE_LIBS := $(patsubst native/%.cpp,native/lib%.so,$(NATIVE_SRCS))

.PHONY: all native test runtest pytest bench lint clean fetch-models

# Released CPM weights (reference model/getModels.sh:3 URLs).  Retries
# harder than install.sh; tests/test_real_weights_smoke.py activates
# automatically once the files exist.
MODEL_HOST := http://posefs1.perception.cs.cmu.edu/Results/RTPose
fetch-models:
	mkdir -p model/coco model/mpi
	curl -fSL --retry 5 --retry-delay 3 -o model/coco/pose_iter_440000.caffemodel $(MODEL_HOST)/pose_iter_440000.caffemodel
	curl -fSL --retry 5 --retry-delay 3 -o model/mpi/pose_iter_160000.caffemodel $(MODEL_HOST)/pose_iter_160000.caffemodel

all: native

native: $(NATIVE_LIBS)

native/lib%.so: native/%.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

# `make runtest` parity: the aggregated suite on an 8-device virtual mesh
test runtest pytest:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

lint:
	$(PY) -m compileall -q caffe_rtpose_tpu tests bench.py __graft_entry__.py

clean:
	rm -f native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
