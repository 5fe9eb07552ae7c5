"""Tensor (channel) model parallelism: params sharded over a ``model`` axis.

The reference scales only by replication (P2PSync data parallel, per-GPU
net replicas for inference) — every GPU holds the full weights.  The
TPU-native extra axis is sharding the weights themselves: conv kernels
(HWIO) and FC matrices split on their output-feature axis across the mesh,
activations correspondingly channel-sharded, XLA's SPMD partitioner
inserting the all-gathers/reduce-scatters over ICI where layers need full
channel views (concat stages, the 1x1 heads).  Use it when the weights (or
optimizer state, via the same placement on ``Solver.history``) outgrow one
chip's HBM; for CPM-sized nets it is a capability demonstration and is
validated against the single-device program in tests and the driver
dryrun.

Placement is by annotation only — the forward code is unchanged (the whole
point of GSPMD: pick a mesh, annotate, let XLA insert collectives).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def channel_spec(mesh: Mesh, a, axis: str = "model") -> NamedSharding:
    """Sharding for one param array: split the trailing (output-feature)
    axis when it divides evenly over the mesh axis; replicate otherwise
    (biases and small heads stay replicated — they are tiny)."""
    n = mesh.shape[axis]
    if a.ndim >= 2 and a.shape[-1] % n == 0 and a.shape[-1] >= n:
        return NamedSharding(mesh, P(*([None] * (a.ndim - 1)), axis))
    return NamedSharding(mesh, P())


def shard_params_channelwise(mesh: Mesh, params, axis: str = "model"):
    """Place a params pytree with output-feature sharding (the HBM-scaling
    placement).  Returns the resharded pytree; each conv/FC weight holds
    1/n of its output channels per device."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, channel_spec(mesh, a, axis)), params)


def make_tp_forward(mesh: Mesh, forward: Callable, axis: str = "model"):
    """Wrap ``forward(params, image_phys)``: params channel-sharded (pass
    them through :func:`shard_params_channelwise` first, or let the
    in-graph constraint reshard), input replicated, output replicated."""
    repl = NamedSharding(mesh, P())

    @jax.jit
    def fn(params, image_phys):
        params = jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, channel_spec(mesh, a, axis)), params)
        image_phys = jax.lax.with_sharding_constraint(image_phys, repl)
        out = forward(params, image_phys)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(a, repl), out)

    return fn


def tp_estimator_fn(mesh: Mesh, estimator, axis: str = "model"):
    """The production fused estimator program (CNN + ImResize + NMS + PAF
    scoring + packing) with channel-sharded weights.  Same signature as
    ``estimator._raw_fn``; outputs replicated (they are the small packed
    result buffers)."""
    repl = NamedSharding(mesh, P())
    raw = estimator._raw_fn

    @jax.jit
    def fn(params, image_phys, nms_thr, inter_thr):
        params = jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, channel_spec(mesh, a, axis)), params)
        image_phys = jax.lax.with_sharding_constraint(image_phys, repl)
        out = raw(params, image_phys, nms_thr, inter_thr)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(a, repl), out)

    return fn


def dryrun_tp(n_devices: int) -> None:
    """Channel-shard a conv trunk's weights over n devices; verify the
    forward matches the unsharded run."""
    import jax.numpy as jnp

    from ..core.net import Net
    from ..ops import layout
    from .dp import make_mesh

    proto = """
    input: "image" input_dim: 2 input_dim: 3 input_dim: 32 input_dim: 32
    layer { name: "c1" type: "Convolution" bottom: "image" top: "c1"
      convolution_param { num_output: 32 pad: 1 kernel_size: 3
        weight_filler { type: "msra" } } }
    layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
    layer { name: "c2" type: "Convolution" bottom: "c1" top: "c2"
      convolution_param { num_output: 16 pad: 1 kernel_size: 3
        weight_filler { type: "msra" } } }
    layer { name: "fc" type: "InnerProduct" bottom: "c2" top: "fc"
      inner_product_param { num_output: 24
        weight_filler { type: "msra" } } }
    """
    net = Net(proto, seed=0)
    mesh = make_mesh(n_devices, axis="model")

    def forward(params, image_phys):
        blobs = net._apply(params, {"image": image_phys},
                           jax.random.PRNGKey(0), None, False)
        return blobs["fc"]

    rs = np.random.RandomState(0)
    x = layout.to_physical(rs.rand(2, 3, 32, 32).astype(np.float32) - 0.5)
    ref = forward(net.params, jnp.asarray(x))
    with mesh:
        sharded = shard_params_channelwise(mesh, net.params)
        out = make_tp_forward(mesh, forward)(sharded, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                               np.asarray(jax.device_get(ref)),
                               rtol=2e-4, atol=2e-4)
    print(f"dryrun_tp({n_devices}): channel-sharded weights forward OK")
