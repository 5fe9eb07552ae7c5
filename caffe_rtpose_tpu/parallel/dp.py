"""Data-parallel training over a jax.sharding.Mesh.

This is the TPU-native replacement for Caffe's P2PSync tree map-reduce
(reference src/caffe/parallel.cpp:287-380): instead of flattening params into
a contiguous buffer and hand-copying gradients up a GPU tree, parameters are
*replicated* and the batch is *sharded* over the ``data`` mesh axis; XLA
inserts the gradient all-reduce over ICI automatically from the sharding
annotations.  Effective batch = per-device batch x N, like
docs/multigpu.md:11.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, batch: Dict[str, jax.Array], axis: str = "data") -> Dict[str, jax.Array]:
    """Place host batch arrays sharded along their leading dim."""
    out = {}
    for k, v in batch.items():
        spec = P(axis) if np.ndim(v) >= 1 else P()
        out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return out


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def make_dp_train_step(mesh: Mesh, loss_fn, update_fn, axis: str = "data"):
    """jit a full train step with params replicated and batch sharded.

    loss_fn(params, inputs, rng) -> scalar; update_fn(params, grads, history,
    lr, it) -> (params, history).  Gradients reduce over ICI via the sharding
    propagation of the replicated-params / sharded-batch annotations.
    """
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(params, history, inputs, rng, lr, it):
        loss, grads = jax.value_and_grad(loss_fn)(params, inputs, rng)
        grads = jax.lax.with_sharding_constraint(grads, repl)
        new_params, new_history = update_fn(params, grads, history, lr, it)
        return loss, new_params, new_history

    return step


# --------------------------------------------------------------- dry run


_DRYRUN_TRAIN_PROTO = """
name: "cpm_tiny_train"
input: "data"  input_dim: 8 input_dim: 3  input_dim: 32 input_dim: 32
input: "label" input_dim: 8 input_dim: 20 input_dim: 8 input_dim: 8
input: "mask"  input_dim: 8 input_dim: 20 input_dim: 1 input_dim: 1
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 16 pad: 1 kernel_size: 3
    weight_filler { type: "msra" } } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "conv2" type: "Convolution" bottom: "pool1" top: "conv2"
  convolution_param { num_output: 16 pad: 1 kernel_size: 3
    weight_filler { type: "msra" } } }
layer { name: "relu2" type: "ReLU" bottom: "conv2" top: "conv2" }
layer { name: "pool2" type: "Pooling" bottom: "conv2" top: "pool2"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "paf" type: "Convolution" bottom: "pool2" top: "paf"
  convolution_param { num_output: 20 pad: 0 kernel_size: 1
    weight_filler { type: "gaussian" std: 0.01 } } }
layer { name: "loss" type: "EuclideanmaskLoss"
  bottom: "paf" bottom: "label" bottom: "mask" top: "loss" }
"""

_DRYRUN_SOLVER = """
base_lr: 0.01
lr_policy: "fixed"
momentum: 0.9
weight_decay: 0.0005
max_iter: 10
type: "SGD"
"""


def dryrun_data_parallel(n_devices: int) -> None:
    """Driver hook: jit the FULL training step (forward, masked L2 loss,
    backward, SGD+momentum update) over an n-device mesh and run one step."""
    from ..core.net import Net
    from ..ops import layout
    from ..proto import prototxt
    from ..training.solver import init_history, make_update_fn
    from ..proto import caffe_pb

    mesh = make_mesh(n_devices)
    net = Net(_DRYRUN_TRAIN_PROTO, phase="TRAIN", seed=0)
    sp = caffe_pb.view(prototxt.parse(_DRYRUN_SOLVER, "SolverParameter"), "SolverParameter")
    lr_mults = {i.name: [pi.lr_mult for pi in i.params] for i in net.impls if i.params}
    decay_mults = {i.name: [pi.decay_mult for pi in i.params] for i in net.impls if i.params}
    update_fn = make_update_fn("SGD", sp, lr_mults, decay_mults)
    loss_fn = net.make_loss_fn()
    step = make_dp_train_step(mesh, loss_fn, update_fn)

    params = replicate(mesh, net.params)
    history = replicate(mesh, init_history("SGD", net.params))
    rs = np.random.RandomState(0)
    batch = {
        "data": layout.to_physical(rs.rand(8, 3, 32, 32).astype(np.float32) - 0.5),
        "label": layout.to_physical(rs.rand(8, 20, 8, 8).astype(np.float32)),
        "mask": layout.to_physical((rs.rand(8, 20, 1, 1) > 0.2).astype(np.float32)),
    }
    inputs = shard_batch(mesh, batch)
    with mesh:
        loss, params, history = step(
            params, history, inputs, jax.random.PRNGKey(0), jnp.float32(0.01), 0
        )
    loss = float(loss)
    assert np.isfinite(loss), f"non-finite dryrun loss {loss}"
    print(f"dryrun_multichip({n_devices}): loss={loss:.5f} OK")
