"""Composed 2-axis mesh training: data x spatial sharding on one mesh.

The reference's only multi-device story is single-axis data parallelism
(P2PSync, src/caffe/parallel.cpp:287-380).  On TPU the same mesh can carry
several parallelism axes at once; the natural composition for the CPM
training workload (small batch, large spatial extent) is

  - ``data``    axis: the global batch is sharded (classic DP; gradient
    all-reduce inserted by XLA over ICI), and
  - ``spatial`` axis: each example's activations are H-sharded through the
    conv trunk (SPMD halo exchanges, same placement as parallel/sp.py),

so an 8-chip slice can run e.g. 4-way DP x 2-way spatial instead of being
forced to choose one axis.  Params and optimizer state stay replicated;
inputs (physical NHWC) are sharded P("data", "spatial", None, None); the
loss is the full cross-device sum, bit-comparable to the single-device
step up to float reduction order.

No reference analog exists (file:line cited above is the single-axis one);
this is the TPU-native generalization the brief's "real tp/pp/dp/sp
shardings" calls for.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh2d(n_devices: Optional[int] = None,
                spatial: int = 2,
                axes: Tuple[str, str] = ("data", "spatial")) -> Mesh:
    """An (n_devices/spatial) x spatial mesh with named axes."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    n = len(devs)
    if spatial < 1 or n % spatial:
        raise ValueError(f"spatial={spatial} must divide device count {n}")
    return Mesh(np.asarray(devs).reshape(n // spatial, spatial), axes)


def shard_batch_2d(mesh: Mesh, batch: Dict[str, jax.Array],
                   data_axis: str = "data",
                   spatial_axis: str = "spatial",
                   nhwc_keys: Optional[set] = None) -> Dict[str, jax.Array]:
    """Place host arrays sharded batch-over-data and H-over-spatial;
    scalars are replicated.  Each dimension falls back to replication
    independently when it does not divide its mesh axis (device placement
    requires even splits; XLA still reshards activations mid-graph where
    profitable) — e.g. batch 10 on a 4x2 mesh keeps the H shard and
    replicates the batch dim instead of raising.

    ``nhwc_keys``, when given, names the arrays known to be in physical
    NHWC layout; only those get dim 1 spatial-sharded.  Other 4-D arrays
    (e.g. still caffe-NCHW) are batch-sharded only, so a channel count
    that happens to divide the spatial axis is never silently H-sharded.
    """
    n_sp = mesh.shape[spatial_axis]
    n_dp = mesh.shape[data_axis]
    out = {}
    for k, v in batch.items():
        nd = np.ndim(v)
        shape = np.shape(v)
        d0 = data_axis if nd >= 1 and shape[0] % n_dp == 0 else None
        spatial_ok = (nd >= 4 and shape[1] % n_sp == 0
                      and (nhwc_keys is None or k in nhwc_keys))
        if spatial_ok:
            spec = P(d0, spatial_axis, *([None] * (nd - 2)))
        elif nd >= 1:
            spec = P(d0)
        else:
            spec = P()
        out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return out


def make_dp_sp_train_step(mesh: Mesh, loss_fn, update_fn,
                          data_axis: str = "data",
                          spatial_axis: str = "spatial"):
    """jit a full train step over the 2-axis mesh: params/opt state
    replicated, inputs batch- AND H-sharded.  XLA's partitioner inserts
    the conv halo exchanges along ``spatial`` and the gradient
    all-reduce over both axes from these annotations alone."""
    repl = NamedSharding(mesh, P())

    n_sp = mesh.shape[spatial_axis]
    n_dp = mesh.shape[data_axis]

    def in_spec(a):
        nd = jnp.ndim(a)
        d0 = data_axis if nd >= 1 and a.shape[0] % n_dp == 0 else None
        if nd >= 4 and a.shape[1] % n_sp == 0:
            return NamedSharding(mesh, P(d0, spatial_axis,
                                         *([None] * (nd - 2))))
        return NamedSharding(mesh, P(d0) if nd >= 1 else P())

    @jax.jit
    def step(params, history, inputs, rng, lr, it):
        params = jax.lax.with_sharding_constraint(params, repl)
        inputs = {k: jax.lax.with_sharding_constraint(v, in_spec(v))
                  for k, v in inputs.items()}
        loss, grads = jax.value_and_grad(loss_fn)(params, inputs, rng)
        grads = jax.lax.with_sharding_constraint(grads, repl)
        new_params, new_history = update_fn(params, grads, history, lr, it)
        return loss, new_params, new_history

    return step


def dp_tp_estimator_fn(mesh: Mesh, estimator,
                       data_axis: str = "data", model_axis: str = "model"):
    """The production fused estimator on a composed 2-axis mesh: the frame
    BATCH sharded over ``data`` and every conv/FC weight channel-sharded
    over ``model`` (the tp.py HBM-scaling placement).  Serves a batch of
    frames with each replica group holding only 1/model_n of the weights.
    Same signature as ``estimator._raw_fn``; outputs batch-sharded."""
    from .tp import channel_spec

    repl = NamedSharding(mesh, P())
    raw = estimator._raw_fn

    def batch_spec(a):
        return NamedSharding(
            mesh, P(data_axis, *([None] * (jnp.ndim(a) - 1)))
            if jnp.ndim(a) >= 1 else P())

    @jax.jit
    def fn(params, image_phys, nms_thr, inter_thr):
        params = jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, channel_spec(mesh, a, model_axis)), params)
        image_phys = jax.lax.with_sharding_constraint(
            image_phys, batch_spec(image_phys))
        out = raw(params, image_phys, nms_thr, inter_thr)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, batch_spec(a) if jnp.ndim(a) >= 1 else repl), out)

    return fn


def dryrun_dp_sp_train(n_devices: int, crop: Optional[int] = None,
                       batch: int = 8, spatial: int = 2,
                       stages: int = 6) -> None:
    """One composed data x spatial training step of the FULL 6-stage COCO
    CPM graph on an (n/spatial) x spatial mesh, asserted against the
    single-device step: same loss, same updated params."""
    import os

    from ..core.net import Net
    from ..models.cpm import make_pose_train_net
    from ..ops import layout
    from ..proto import caffe_pb, prototxt
    from ..training.solver import init_history, make_update_fn
    from .dp import replicate

    crop = crop or int(os.environ.get("CRT_DRYRUN_CROP", "184"))
    net_param = make_pose_train_net(batch=batch, crop=crop, stages=stages)
    net = Net(net_param, phase="TRAIN", seed=0)
    sp_msg = prototxt.parse(
        'base_lr: 0.000040 lr_policy: "fixed" momentum: 0.9 '
        'weight_decay: 0.0005 type: "SGD"', "SolverParameter")
    sp = caffe_pb.view(sp_msg, "SolverParameter")
    lr_mults = {i.name: [pi.lr_mult for pi in i.params]
                for i in net.impls if i.params}
    decay_mults = {i.name: [pi.decay_mult for pi in i.params]
                   for i in net.impls if i.params}
    update_fn = make_update_fn("SGD", sp, lr_mults, decay_mults)
    loss_fn = net.make_loss_fn()

    grid = crop // 8
    np_ch = 2 * (38 + 19 - 1 + 1)
    rs = np.random.RandomState(7)
    batch_arrays = {
        "data": layout.to_physical(
            rs.rand(batch, 3, crop, crop).astype(np.float32) - 0.5),
        "label": layout.to_physical(
            rs.rand(batch, np_ch, grid, grid).astype(np.float32)),
    }

    # single-device reference step
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(4e-5)
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
        net.params, {k: jnp.asarray(v) for k, v in batch_arrays.items()}, rng)
    ref_params, _ = update_fn(net.params, ref_grads,
                              init_history("SGD", net.params), lr, 0)
    ref_loss = float(ref_loss)

    mesh = make_mesh2d(n_devices, spatial=spatial)
    step = make_dp_sp_train_step(mesh, loss_fn, update_fn)
    params = replicate(mesh, net.params)
    history = replicate(mesh, init_history("SGD", net.params))
    inputs = shard_batch_2d(mesh, batch_arrays)
    with mesh:
        loss, params, history = step(params, history, inputs, rng, lr, 0)
    loss = float(loss)
    assert np.isfinite(loss), f"non-finite dp x sp train loss {loss}"
    assert abs(loss - ref_loss) <= 1e-3 * max(1.0, abs(ref_loss)), (
        f"dp x sp loss {loss} != single-device {ref_loss}")
    # updated params agree with the single-device step (float reduction
    # order differs across the partitioning)
    flat_s = jax.tree_util.tree_leaves(params)
    flat_r = jax.tree_util.tree_leaves(ref_params)
    for a, b in list(zip(flat_s, flat_r))[::7][:8]:
        np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                   np.asarray(jax.device_get(b)),
                                   rtol=2e-3, atol=2e-5)
    dshape = dict(zip(mesh.axis_names, mesh.devices.shape))
    print(f"dryrun_dp_sp_train({n_devices}): {stages}-stage COCO train step "
          f"on a {dshape['data']}x{dshape['spatial']} data x spatial mesh, "
          f"loss={loss:.5f} == single-device OK")
