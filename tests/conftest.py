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

# The environment may pre-register a TPU platform plugin that wins over the
# env var; force the CPU backend explicitly before any backend initializes.
jax.config.update("jax_platforms", "cpu")
