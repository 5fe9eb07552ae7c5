"""Pipeline parallelism over the CPM refinement stages.

The CPM topology is the textbook pipeline: stages 2..K are structurally
IDENTICAL dual-branch blocks (concat(L1, L2, trunk feat) -> 5x 7x7x128 ->
1x1x128 -> 1x1 heads; models/cpm.py make_stages, mirroring
pose_deploy_linevec.prototxt), differing only in weights.  So the stage
weights stack into one leading ``stage`` axis sharded over the mesh —
each device holds ONE stage — and microbatched frames flow device ->
device via ``ppermute`` over ICI (GPipe schedule: M microbatches drain in
M + S - 1 steps, bubble fraction (S-1)/(M+S-1)).

This is the one canonical parallelism axis the reference topology admits
that replication cannot give you: per-device weight AND activation
footprint drops to one stage's worth while every device computes every
step once the pipe is full.  dp (parallel/dp.py), frame-parallel
(parallel/inference.py), spatial (parallel/sp.py) and channel/tensor
(parallel/tp.py) cover the other axes; expert parallelism has no analog
here (no MoE/conditional routing anywhere in the reference).

Validated == the monolithic single-device net in tests/test_pp.py and the
driver dryrun (the pipelined stages reproduce the full net's
Mconv7_stage6 intermediates exactly).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_refine_stage_net(n_paf: int = 38, n_heat: int = 19,
                          hw: Tuple[int, int] = (46, 82), feat_ch: int = 128,
                          width: int = 128):
    """A single generic refinement stage as its own Net: inputs
    ``prev_L1``/``prev_L2``/``feat``, outputs ``Mconv7_L1``/``Mconv7_L2``.
    Layer names are the full net's with the ``_stage{t}`` index stripped,
    so per-stage params map 1:1 by name.  ``width`` shrinks the conv
    channel count below the reference's 128 for cheap train-step tests."""
    from ..core.net import Net
    from ..models.cpm import _conv, _relu

    h, w = hw
    layers: List[Dict[str, Any]] = [{
        "name": "concat", "type": "Concat",
        "bottom": ["prev_L1", "prev_L2", "feat"], "top": ["concat"],
        "concat_param": {"axis": 1},
    }]
    b = {"L1": "concat", "L2": "concat"}
    for i in range(1, 6):
        for br in ("L1", "L2"):
            name = f"Mconv{i}_{br}"
            layers.append(_conv(name, b[br], width, 7, 3))
            layers.append(_relu(f"Mrelu{i}_{br}", name))
            b[br] = name
    for br in ("L1", "L2"):
        name = f"Mconv6_{br}"
        layers.append(_conv(name, b[br], width, 1, 0))
        layers.append(_relu(f"Mrelu6_{br}", name))
        b[br] = name
    for br, nout in (("L1", n_paf), ("L2", n_heat)):
        layers.append(_conv(f"Mconv7_{br}", b[br], nout, 1, 0))
    net_param = {
        "input": ["prev_L1", "prev_L2", "feat"],
        "input_shape": [
            {"dim": [1, n_paf, h, w]},
            {"dim": [1, n_heat, h, w]},
            {"dim": [1, feat_ch, h, w]},
        ],
        "layer": layers,
    }
    return Net(net_param, phase="TEST", seed=0)


def stack_stage_params(full_params: Dict[str, List[Any]],
                       stages: range) -> Dict[str, List[Any]]:
    """Stack the full net's per-stage weights over a leading ``stage``
    axis, keyed by the generic (index-stripped) layer names."""
    out: Dict[str, List[Any]] = {}
    for i in list(range(1, 8)):
        for br in ("L1", "L2"):
            generic = f"Mconv{i}_{br}"
            per_stage = [full_params[f"Mconv{i}_stage{t}_{br}"]
                         for t in stages]
            out[generic] = [jnp.stack([p[j] for p in per_stage])
                            for j in range(len(per_stage[0]))]
    return out


def pipeline_refine(mesh: Mesh, stage_net, stacked_params,
                    l1_0, l2_0, feat, axis: str = "stage"):
    """Run M microbatches through S pipelined stages (S = mesh axis size).

    ``l1_0``/``l2_0``: [M, 1, C, h, w] stage-1 branch outputs (caffe
    layout as stage_net expects its physical inputs — pass what
    ``stage_net.forward`` would take, already converted);
    ``feat``: [M, 1, 128, h, w] trunk features.  Returns (L1, L2) of the
    LAST stage for every microbatch, [M, ...], replicated.

    The schedule is the static GPipe unroll: step t, device d works on
    microbatch t - d; hand-off via ppermute(d -> d+1).  Inputs are
    replicated (tiny at net-res/8) — only the weights are sharded."""
    S = mesh.shape[axis]
    M = int(l1_0.shape[0])
    body = _pipeline_body(stage_net, S, M, axis)
    pspec = jax.tree_util.tree_map(
        lambda _: P(axis), stacked_params)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    return fn(stacked_params, l1_0, l2_0, feat)


def _pipeline_body(stage_net, S: int, M: int, axis: str):
    """The per-device GPipe schedule, as a function suitable for
    ``shard_map`` over a stage-sharded weight stack.  Pure jax — so it is
    also DIFFERENTIABLE: ``ppermute`` transposes to the inverse permute
    and ``psum`` to a broadcast, which makes ``jax.grad`` through this
    body exactly the reverse-schedule backward pipeline (activations
    rematerialized per stage, gradients flowing d -> d-1 over ICI)."""

    # stage subnet as a pure function of (params_one_stage, l1, l2, feat)
    def stage_apply(pstack, l1, l2, feat1):
        # pstack leaves carry the local stage shard with leading axis 1
        p = jax.tree_util.tree_map(lambda a: a[0], pstack)
        blobs = stage_net._apply(
            p, {"prev_L1": l1, "prev_L2": l2, "feat": feat1},
            jax.random.PRNGKey(0), None, False)
        return blobs["Mconv7_L1"], blobs["Mconv7_L2"]

    def body(pstack, l1_all, l2_all, feat_all):
        d = jax.lax.axis_index(axis)
        first = d == 0
        cur_l1 = jnp.zeros_like(l1_all[0])
        cur_l2 = jnp.zeros_like(l2_all[0])
        cur_ft = jnp.zeros_like(feat_all[0])
        out_l1 = jnp.zeros((M,) + tuple(l1_all.shape[1:]), l1_all.dtype)
        out_l2 = jnp.zeros((M,) + tuple(l2_all.shape[1:]), l2_all.dtype)
        fwd = [(i, i + 1) for i in range(S - 1)]
        for t in range(M + S - 1):
            m0 = min(t, M - 1)  # microbatch entering the pipe this step
            in_l1 = jnp.where(first, l1_all[m0], cur_l1)
            in_l2 = jnp.where(first, l2_all[m0], cur_l2)
            in_ft = jnp.where(first, feat_all[m0], cur_ft)
            y1, y2 = stage_apply(pstack, in_l1, in_l2, in_ft)
            m_done = t - (S - 1)  # microbatch the LAST stage finished
            if 0 <= m_done < M:
                on_last = d == S - 1
                out_l1 = out_l1.at[m_done].set(
                    jnp.where(on_last, y1, out_l1[m_done]))
                out_l2 = out_l2.at[m_done].set(
                    jnp.where(on_last, y2, out_l2[m_done]))
            if t < M + S - 2:  # hand the activations to the next stage
                cur_l1 = jax.lax.ppermute(y1, axis, fwd)
                cur_l2 = jax.lax.ppermute(y2, axis, fwd)
                cur_ft = jax.lax.ppermute(in_ft, axis, fwd)
        # results live on the last device only; make them replicated
        mask = (d == S - 1).astype(out_l1.dtype)
        out_l1 = jax.lax.psum(out_l1 * mask, axis)
        out_l2 = jax.lax.psum(out_l2 * mask, axis)
        return out_l1, out_l2

    return body


def make_pp_train_step(mesh, stage_net, M: int, lr: float = 0.01,
                       axis: str = "stage"):
    """A TRAINING step through the GPipe schedule: forward the M
    microbatches through the S pipelined stages, Euclidean loss on the
    last stage's two branch outputs (the reference trains every CPM stage
    with EuclideanLoss heads — src/caffe/layers/euclidean_loss_layer.cpp
    there), backward via ``jax.grad`` THROUGH the ppermute schedule, and
    a vanilla-SGD update applied to the stage-sharded weight stack in
    place (each device updates only its own stage's shard; no gradient
    collective is needed because stage weights are disjoint).

    Returns ``step(stacked_params, l1_0, l2_0, feat, tgt1, tgt2) ->
    (loss, new_stacked_params)``, jitted over ``mesh``.  Beyond-reference
    scope: the reference never pipelines training (SURVEY §5)."""
    S = mesh.shape[axis]
    body = _pipeline_body(stage_net, S, M, axis)

    def forward(stacked, l1, l2, feat):
        pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(pspec, P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(stacked, l1, l2, feat)

    def loss_fn(stacked, l1, l2, feat, t1, t2):
        o1, o2 = forward(stacked, l1, l2, feat)
        # caffe EuclideanLoss: sum of squares / (2 * batch), per head
        m = o1.shape[0]
        return (jnp.sum((o1 - t1) ** 2) + jnp.sum((o2 - t2) ** 2)) / (2 * m)

    @jax.jit
    def step(stacked, l1, l2, feat, t1, t2):
        loss, grads = jax.value_and_grad(loss_fn)(
            stacked, l1, l2, feat, t1, t2)
        new = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, stacked, grads)
        return loss, new

    return step


def monolithic_train_step(stage_net, S: int, lr: float = 0.01):
    """Single-device reference for ``make_pp_train_step``: the same
    stacked weights run sequentially (stage t = ``stacked[t]``), same
    loss, same SGD update — the ground truth the pipelined step must
    reproduce."""

    def apply_one(p, l1, l2, feat1):
        blobs = stage_net._apply(
            p, {"prev_L1": l1, "prev_L2": l2, "feat": feat1},
            jax.random.PRNGKey(0), None, False)
        return blobs["Mconv7_L1"], blobs["Mconv7_L2"]

    def loss_fn(stacked, l1, l2, feat, t1, t2):
        M = l1.shape[0]

        def one(m):
            c1, c2 = l1[m], l2[m]
            for t in range(S):
                p = jax.tree_util.tree_map(lambda a: a[t], stacked)
                c1, c2 = apply_one(p, c1, c2, feat[m])
            return c1, c2
        outs = [one(m) for m in range(M)]
        o1 = jnp.stack([o[0] for o in outs])
        o2 = jnp.stack([o[1] for o in outs])
        return (jnp.sum((o1 - t1) ** 2) + jnp.sum((o2 - t2) ** 2)) / (2 * M)

    @jax.jit
    def step(stacked, l1, l2, feat, t1, t2):
        loss, grads = jax.value_and_grad(loss_fn)(
            stacked, l1, l2, feat, t1, t2)
        new = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, stacked, grads)
        return loss, new

    return step


def dryrun_pp_train(n_devices: int, hw: Tuple[int, int] = (6, 8),
                    micro: int = 4, width: int = 8) -> None:
    """Run ONE pipelined training step (forward + backward + SGD through
    the GPipe schedule) and assert loss AND every updated weight equal
    the monolithic single-device step on the same data."""
    if n_devices < 2:
        raise ValueError("pipeline train dryrun needs >= 2 devices")
    S = min(n_devices, 5)
    n_paf, n_heat, feat_ch = 4, 3, 8
    stage_net = make_refine_stage_net(
        n_paf=n_paf, n_heat=n_heat, hw=hw, feat_ch=feat_ch, width=width)

    rs = np.random.RandomState(23)
    h, w = hw
    # independent per-stage weights, stacked over the leading stage axis
    base = stage_net.params
    stacked = {
        k: [jnp.asarray(np.stack(
            [rs.rand(*np.asarray(p).shape).astype(np.float32) * 0.1 - 0.05
             for _ in range(S)])) for p in plist]
        for k, plist in base.items()}
    # stage_net._apply consumes/produces PHYSICAL NHWC tensors
    args = [jnp.asarray(rs.rand(micro, 1, h, w, c).astype(np.float32) - 0.5)
            for c in (n_paf, n_heat, feat_ch, n_paf, n_heat)]

    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    pp_step = make_pp_train_step(mesh, stage_net, micro)
    loss_pp, new_pp = pp_step(stacked, *args)

    mono_step = monolithic_train_step(stage_net, S)
    loss_mono, new_mono = mono_step(stacked, *args)

    np.testing.assert_allclose(float(loss_pp), float(loss_mono),
                               rtol=1e-5)
    for k in new_pp:
        for a, b in zip(new_pp[k], new_mono[k]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
    print(f"dryrun_pp_train({n_devices}): pipelined train step "
          f"(fwd+bwd+SGD over {S} stages, {micro} microbatches) == "
          f"monolithic step OK (loss {float(loss_pp):.6f})")


def dryrun_pp(n_devices: int, hw: Tuple[int, int] = (24, 32),
              micro: int = 6) -> None:
    """Pipeline the identical COCO refinement stages one-per-device and
    assert the microbatched pipe reproduces the monolithic net's
    corresponding stage outputs exactly.  Uses ``min(n_devices, 5)``
    stages (the COCO net has 5 refinement stages, 2..6), so 2-4 device
    meshes pipeline a prefix of the refinement chain."""
    from ..core.net import Net
    from ..models.cpm import make_pose_deploy_net

    if n_devices < 2:
        raise ValueError("pipeline dryrun needs >= 2 devices")
    S = min(n_devices, 5)  # stages 2..S+1 of the 6-stage net
    last = f"_stage{S + 1}"
    h, w = hw
    proto = make_pose_deploy_net("COCO", input_dim=(1, 3, h * 8, w * 8))
    full = Net(proto, phase="TEST", seed=7)

    rs = np.random.RandomState(11)
    feats, l1s, l2s, want1, want2 = [], [], [], [], []
    for m in range(micro):
        img = rs.rand(1, 3, h * 8, w * 8).astype(np.float32) - 0.5
        out = full.forward(
            {"image": img},
            outputs=["conv5_5_CPM_L1", "conv5_5_CPM_L2", "conv4_4_CPM",
                     f"Mconv7{last}_L1", f"Mconv7{last}_L2"])
        l1s.append(out["conv5_5_CPM_L1"])
        l2s.append(out["conv5_5_CPM_L2"])
        feats.append(out["conv4_4_CPM"])
        want1.append(out[f"Mconv7{last}_L1"])
        want2.append(out[f"Mconv7{last}_L2"])

    stage_net = make_refine_stage_net(hw=(h, w))
    stacked = stack_stage_params(full.params, range(2, 2 + S))
    from ..ops import layout

    to_phys = lambda arrs: jnp.asarray(  # noqa: E731
        np.stack([np.asarray(layout.to_physical(jnp.asarray(a)))
                  for a in arrs]))
    mesh = Mesh(np.array(jax.devices()[:S]), (("stage",)))
    out1, out2 = pipeline_refine(
        mesh, stage_net, stacked,
        to_phys(l1s), to_phys(l2s), to_phys(feats))
    got1 = np.stack([np.asarray(layout.to_caffe(a)) for a in out1])
    got2 = np.stack([np.asarray(layout.to_caffe(a)) for a in out2])
    np.testing.assert_allclose(got1, np.stack(want1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got2, np.stack(want2), rtol=2e-4, atol=2e-4)
    print(f"dryrun_pp({n_devices}): {micro} microbatches through "
          f"{S} pipelined refinement stages == monolithic net OK")
