"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the reference's multi-device test matrix idea (MultiDeviceTest,
reference include/caffe/test/test_caffe_main.hpp) by running every test on the
CPU backend with 8 virtual devices so sharding paths are exercised without
TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest

# The environment may pre-register a TPU platform plugin that wins over the
# env var; force the CPU backend explicitly before any backend initializes.
jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------------------
# Suite sharding markers (reference `make runtest` is one aggregated binary;
# this suite is ~500 tests with a few multi-minute oracle files, so every
# test gets exactly one of three markers based on its file's measured 1-CPU
# wall time — see `make runtest-shards` and docs/testing.md for the recipe):
#
#   unit    — seconds-per-file; the whole tier finishes in a few minutes
#   oracle  — compiles/executes reference C++/CUDA sources from
#             /root/reference as ground truth; tens of seconds to ~2 min/file
#   heavy   — multi-minute files (full-CNN compiles, end-to-end pipelines,
#             multiprocess dryruns); run these one file per shard
# ---------------------------------------------------------------------------

HEAVY_FILES = {
    "test_ref_image_e2e.py",      # 2 image-file e2e chains, full CNN compiles
    "test_eval_and_parallel.py",  # dp/tp/sp/mesh2d + 2-process multihost dryrun
    "test_matlab_demos.py",       # matcaffe demos through the MATLAB engine
    "test_pipeline.py",           # realtime pipeline soak tests
    "test_pp.py",                 # pipeline-parallel fwd + training
    "test_ref_render_parity.py",  # 17 cases through the compiled render kernels
    "test_ref_fuzz_parity.py",    # 32 fuzzed DAGs vs the compiled reference
    "test_ref_parity.py",         # COCO/MPI whole-CNN oracle parity
    "test_ref_composed_e2e.py",   # 3 full-CNN e2e chains at production res
                                  # (~11 min solo; split across 2 shards)
    "test_estimator.py",          # several full-CNN (656x368) compiles
    "test_optimized_path.py",     # packed/batched estimator program variants
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in HEAVY_FILES:
            item.add_marker(pytest.mark.heavy)
        elif fname.startswith("test_ref_") or fname == "test_layer_oracles.py":
            item.add_marker(pytest.mark.oracle)
        else:
            item.add_marker(pytest.mark.unit)
