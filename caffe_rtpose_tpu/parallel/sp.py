"""Spatial model parallelism for the conv trunk.

The reference has no attention/sequence axes; its "large input" scaling axes
are spatial resolution and the multi-scale batch (SURVEY §5).  When one chip
is not enough for a resolution, the TPU-native move is to shard the
activations over H across a ``spatial`` mesh axis and let XLA's SPMD
partitioner insert the conv halo exchanges — no manual ring code needed.
Params stay replicated; the output is resharded (or gathered) as requested.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_forward(mesh: Mesh, forward: Callable, axis: str = "spatial"):
    """Wrap ``forward(params, image_phys)`` with H-sharded input/replicated
    params.  ``image_phys`` is NHWC; H (axis 1) is sharded."""
    img_sharding = NamedSharding(mesh, P(None, axis, None, None))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def fn(params, image_phys):
        params = jax.lax.with_sharding_constraint(params, repl)
        image_phys = jax.lax.with_sharding_constraint(image_phys, img_sharding)
        return forward(params, image_phys)

    return fn


def spatial_estimator_fn(mesh: Mesh, estimator, axis: str = "spatial"):
    """Shard the estimator's fused device program over H of the input canvas
    (the headroom path when one chip can't hold a very large
    ``--net_resolution``): params replicated, image H-sharded, the small
    peak/score outputs replicated.  XLA's SPMD partitioner inserts the conv
    halo exchanges over ICI.

    Returns ``fn(params, image_phys, nms_thr, inter_thr)`` jitted over the
    mesh; use with ``estimator._raw_fn``-compatible inputs (see
    PoseEstimator.run_device for layouts)."""
    img_sharding = NamedSharding(mesh, P(None, axis, None, None))
    repl = NamedSharding(mesh, P())
    raw = estimator._raw_fn

    @jax.jit
    def fn(params, image_phys, nms_thr, inter_thr):
        params = jax.lax.with_sharding_constraint(params, repl)
        image_phys = jax.lax.with_sharding_constraint(image_phys, img_sharding)
        out = raw(params, image_phys, nms_thr, inter_thr)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(a, repl), out)

    return fn


def dryrun_spatial(n_devices: int) -> None:
    """Shard a conv+pool trunk forward over H across n devices; verify the
    result matches the unsharded run."""
    from ..core.net import Net
    from ..ops import layout
    from .dp import make_mesh

    proto = """
    input: "image" input_dim: 2 input_dim: 3 input_dim: 64 input_dim: 64
    layer { name: "c1" type: "Convolution" bottom: "image" top: "c1"
      convolution_param { num_output: 16 pad: 1 kernel_size: 3
        weight_filler { type: "msra" } } }
    layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
    layer { name: "p1" type: "Pooling" bottom: "c1" top: "p1"
      pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
    layer { name: "c2" type: "Convolution" bottom: "p1" top: "c2"
      convolution_param { num_output: 16 pad: 3 kernel_size: 7
        weight_filler { type: "msra" } } }
    """
    net = Net(proto, seed=0)
    mesh = make_mesh(n_devices, axis="spatial")

    def forward(params, image_phys):
        blobs = net._apply(params, {"image": image_phys}, jax.random.PRNGKey(0), None, False)
        return blobs["c2"]

    rs = np.random.RandomState(0)
    x = layout.to_physical(rs.rand(2, 3, 64, 64).astype(np.float32) - 0.5)
    ref = forward(net.params, jnp.asarray(x))
    fn = make_spatial_forward(mesh, forward)
    with mesh:
        out = fn(net.params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                               np.asarray(jax.device_get(ref)), rtol=2e-4, atol=2e-4)
    print(f"dryrun_spatial({n_devices}): conv trunk H-sharded forward OK")
