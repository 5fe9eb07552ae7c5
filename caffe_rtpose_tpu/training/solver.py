"""Solvers with Caffe-exact update rules (reference src/caffe/solvers/*.cpp,
src/caffe/solver.cpp).

Design: the per-iteration update is one jitted pure function over the
(params, grads, history) pytrees — the TPU-native replacement for Caffe's
per-blob ``ComputeUpdateValue`` loops.  Learning-rate policy evaluation stays
on host (it is a scalar function of the iteration, solver.cpp GetLearningRate)
and feeds the update as a traced scalar, so one compiled update serves all
iterations.

Semantics matched per algorithm (sgd_solver.cpp and friends):
  * lr policies: fixed/step/exp/inv/multistep/poly/sigmoid
  * gradient normalization by iter_size, L1/L2 regularization with per-param
    decay_mult, global L2-norm gradient clipping
  * SGD/Nesterov/AdaGrad/RMSProp/AdaDelta/Adam history handling, including
    Caffe's Adam bias correction form
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..proto import caffe_pb
from ..proto.caffe_pb import View


def learning_rate(sp: View, it: int) -> float:
    """Solver::GetLearningRate (sgd_solver.cpp:27-70)."""
    policy = sp.lr_policy
    base = float(sp.base_lr)
    if policy == "fixed":
        return base
    if policy == "step":
        current_step = it // int(sp.stepsize)
        return base * float(sp.gamma) ** current_step
    if policy == "exp":
        return base * float(sp.gamma) ** it
    if policy == "inv":
        return base * (1.0 + float(sp.gamma) * it) ** (-float(sp.power))
    if policy == "multistep":
        current_step = 0
        for sv in sp.stepvalue:
            if it >= sv:
                current_step += 1
        return base * float(sp.gamma) ** current_step
    if policy == "poly":
        return base * (1.0 - it / float(sp.max_iter)) ** float(sp.power)
    if policy == "sigmoid":
        return base * (1.0 / (1.0 + math.exp(-float(sp.gamma) * (it - float(sp.stepsize)))))
    raise ValueError(f"unknown lr policy {policy!r}")


HISTORY_SLOTS = {"SGD": 1, "Nesterov": 1, "AdaGrad": 1, "RMSProp": 1, "AdaDelta": 2, "Adam": 2}


def init_history(solver_type: str, params) -> Dict[str, Any]:
    slots = HISTORY_SLOTS[solver_type]
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    return {f"h{i}": zeros() for i in range(slots)}


def make_update_fn(
    solver_type: str,
    sp: View,
    lr_mults,
    decay_mults,
):
    """Returns update(params, grads, history, lr, it) -> (params, history).

    ``lr_mults``/``decay_mults`` are pytrees matching params (from ParamSpec
    lr_mult/decay_mult, layer.hpp param specs).
    """
    momentum = float(sp.momentum) if sp.has("momentum") else 0.0
    momentum2 = float(sp.momentum2)
    delta = float(sp.delta)
    rms_decay = float(sp.rms_decay) if sp.has("rms_decay") else 0.99
    weight_decay = float(sp.weight_decay) if sp.has("weight_decay") else 0.0
    reg_type = sp.regularization_type
    clip = float(sp.clip_gradients)
    iter_size = int(sp.iter_size)

    def regularize(g, p, dmult):
        wd = weight_decay * dmult
        if reg_type == "L2":
            return g + wd * p
        if reg_type == "L1":
            return g + wd * jnp.sign(p)
        return g

    def update(params, grads, history, lr, it):
        # caffe never computes diffs for lr_mult==0 params
        # (param_propagate_down false) — their diffs stay zero, so they
        # must not pollute the clip norm below
        grads = jax.tree_util.tree_map(
            lambda g, lm: g if lm else jnp.zeros_like(g), grads, lr_mults)
        leaves_g = jax.tree_util.tree_leaves(grads)
        # caffe order (sgd_solver.cpp): ClipGradients runs on the RAW
        # accumulated diffs, Normalize (divide by iter_size) comes after
        if clip > 0:
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves_g))
            scale = jnp.where(gnorm > clip, clip / gnorm, 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        if iter_size != 1:
            grads = jax.tree_util.tree_map(lambda g: g / iter_size, grads)
        grads = jax.tree_util.tree_map(regularize, grads, params, decay_mults)

        h1 = history["h0"]
        h2 = history.get("h1")

        if solver_type == "SGD":
            def upd(p, g, h, lm):
                v = momentum * h + (lr * lm) * g
                return p - v, v

            out = jax.tree_util.tree_map(upd, params, grads, h1, lr_mults)
            new_p = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
            new_h = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
            return new_p, {"h0": new_h}

        if solver_type == "Nesterov":
            def upd(p, g, h, lm):
                v = momentum * h + (lr * lm) * g
                step = (1 + momentum) * v - momentum * h
                return p - step, v

            out = jax.tree_util.tree_map(upd, params, grads, h1, lr_mults)
            return (
                jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple)),
                {"h0": jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))},
            )

        if solver_type == "AdaGrad":
            def upd(p, g, h, lm):
                h_new = h + g * g
                step = (lr * lm) * g / (jnp.sqrt(h_new) + delta)
                return p - step, h_new

            out = jax.tree_util.tree_map(upd, params, grads, h1, lr_mults)
            return (
                jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple)),
                {"h0": jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))},
            )

        if solver_type == "RMSProp":
            def upd(p, g, h, lm):
                h_new = rms_decay * h + (1 - rms_decay) * g * g
                step = (lr * lm) * g / (jnp.sqrt(h_new) + delta)
                return p - step, h_new

            out = jax.tree_util.tree_map(upd, params, grads, h1, lr_mults)
            return (
                jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple)),
                {"h0": jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))},
            )

        if solver_type == "AdaDelta":
            mom = momentum  # caffe reuses momentum as the decay
            def upd(p, g, h, h2_, lm):
                h_new = mom * h + (1 - mom) * g * g
                step = g * jnp.sqrt((h2_ + delta) / (h_new + delta)) * (lr * lm)
                h2_new = mom * h2_ + (1 - mom) * step * step / jnp.maximum((lr * lm) ** 2, 1e-30)
                return p - step, h_new, h2_new

            # caffe accumulates update^2 (pre-lr); replicate: compute raw step
            def upd_exact(p, g, h, h2_, lm):
                h_new = mom * h + (1 - mom) * g * g
                raw = g * jnp.sqrt((h2_ + delta) / (h_new + delta))
                h2_new = mom * h2_ + (1 - mom) * raw * raw
                return p - (lr * lm) * raw, h_new, h2_new

            out = jax.tree_util.tree_map(upd_exact, params, grads, h1, h2, lr_mults)
            pick = lambda i: jax.tree_util.tree_map(
                lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple)
            )
            return pick(0), {"h0": pick(1), "h1": pick(2)}

        if solver_type == "Adam":
            t = it + 1
            correction = jnp.sqrt(1.0 - momentum2 ** t) / (1.0 - momentum ** t)

            def upd(p, g, m, v, lm):
                m_new = momentum * m + (1 - momentum) * g
                v_new = momentum2 * v + (1 - momentum2) * g * g
                step = (lr * lm) * correction * m_new / (jnp.sqrt(v_new) + delta)
                return p - step, m_new, v_new

            out = jax.tree_util.tree_map(upd, params, grads, h1, h2, lr_mults)
            pick = lambda i: jax.tree_util.tree_map(
                lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple)
            )
            return pick(0), {"h0": pick(1), "h1": pick(2)}

        raise ValueError(f"unknown solver type {solver_type!r}")

    return update


class Solver:
    """Training driver: Step loop + snapshot/restore (Solver::Step,
    solver.cpp:194-327).  Data is supplied by a callable
    ``next_batch(it) -> {blob_name: array}`` since the TPU pipeline feeds
    inputs host-side (replacing Caffe's internal data layers)."""

    def __init__(
        self,
        solver_param,
        net,
        next_batch: Callable[[int], Dict[str, np.ndarray]],
        test_nets: Optional[List] = None,
        input_transform: Optional[Callable] = None,
        mesh=None,
    ):
        """``input_transform``, when given, is a jittable
        ``fn(inputs_dict) -> inputs_dict`` fused into the compiled train
        step before the net applies — used e.g. to rasterize CPM
        heatmap/PAF labels on device from augmented joint coordinates
        (training.labels_device) instead of shipping full label tensors
        from host."""
        if isinstance(solver_param, str):
            from ..proto import prototxt

            if "\n" in solver_param or ":" in solver_param:
                solver_param = prototxt.parse(solver_param, "SolverParameter")
            else:
                solver_param = prototxt.parse_file(solver_param, "SolverParameter")
        self.sp = caffe_pb.view(solver_param, "SolverParameter")
        self.net = net
        self.next_batch = next_batch
        self.type = self.sp.type if self.sp.has("type") else "SGD"
        self.it = 0
        self.current_step = 0

        # pytrees aligned with net.params
        self.lr_mults = {
            name: [pi.lr_mult for pi in impl.params]
            for name, impl in ((i.name, i) for i in net.impls)
            if impl.params
        }
        self.decay_mults = {
            name: [pi.decay_mult for pi in impl.params]
            for name, impl in ((i.name, i) for i in net.impls)
            if impl.params
        }
        self.history = init_history(self.type, net.params)
        self._update = jax.jit(make_update_fn(self.type, self.sp, self.lr_mults, self.decay_mults))
        # stat-carrying layers (BatchNorm in TRAIN): thread their batch
        # stats out of the jitted loss and roll the running averages exactly
        # like the reference's in-Forward mutation (batch_norm_layer.cpp:
        # 120-136: scale = scale*maf + 1; mean = mu + maf*mean;
        # var = m/(m-1)*var_batch + maf*var)
        self._bn_meta = {i.name: (float(i.meta["bn_maf"]), int(i.meta["bn_m"]))
                         for i in net.impls if i.aux_apply is not None}
        loss_fn = net.make_loss_fn(with_aux=bool(self._bn_meta),
                                   with_outputs=True)
        if input_transform is not None:
            base_loss = loss_fn

            def loss_fn(params, inputs, rng):  # noqa: F811
                return base_loss(params, input_transform(inputs), rng)

        # test nets: list of (net, data_fn_or_None, test_iter) —
        # Solver::TestAll/Test (solver.cpp:328-380): weights shared from the
        # train net by layer name, output blobs averaged over test_iter
        self.test_nets: List[Tuple[Any, Optional[Callable], int]] = list(test_nets or [])
        self.mesh = mesh
        if mesh is not None:
            # multi-device data parallel, replacing P2PSync (parallel.cpp):
            # params/history replicated, batch sharded on its leading axis;
            # XLA inserts the gradient all-reduce over ICI from the
            # sharding annotations (see parallel/dp.py)
            from ..parallel.dp import replicate

            self.net.params = replicate(mesh, self.net.params)
            self.history = replicate(mesh, self.history)
        # has_aux is always True: the aux tuple carries (bn_stats_or_None,
        # train-forward output blobs).  The outputs ride along as device
        # arrays (losses/scores — small) and are only fetched on read.
        self._grad = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        # output blobs of the most recent training forward (physical
        # layout, on device) — Solver::Step display / pycaffe blobs idiom
        self.last_outputs: Dict[str, Any] = {}

        bn_meta = self._bn_meta

        def bn_roll(params, aux):
            out = dict(params)
            for name, (mu, var) in aux.items():
                maf, m = bn_meta[name]
                mean_b, var_b, scale_b = params[name]
                corr = m / (m - 1) if m > 1 else 1.0
                out[name] = [
                    mu + maf * mean_b,
                    corr * var + maf * var_b,
                    scale_b * maf + 1.0,
                ]
            return out

        self._bn_roll = jax.jit(bn_roll) if self._bn_meta else None
        self.smoothed_losses: List[float] = []

    def step(self, iters: int = 1, callback=None) -> float:
        """Run ``iters`` iterations; returns the last loss."""
        from ..ops import layout as lay

        loss_val = float("nan")
        for _ in range(iters):
            interval = int(self.sp.test_interval) if self.sp.has("test_interval") else 0
            if (self.test_nets and interval and self.it % interval == 0
                    and (self.it > 0 or bool(self.sp.test_initialization))):
                self.test_all()
            lr = learning_rate(self.sp, self.it)
            total_loss = None
            grads_acc = None
            from .datasets import StagedBatch

            for _sub in range(int(self.sp.iter_size)):
                batch = self.next_batch(self.it)
                if isinstance(batch, StagedBatch) and self.mesh is not None:
                    raise ValueError(
                        "stage_batches targets a single device; use the "
                        "plain prefetch ring with mesh data-parallel "
                        "(shard_batch owns placement there)")
                if isinstance(batch, StagedBatch):
                    # device-staged ring (datasets.stage_batches): arrays
                    # are already on device in physical layout — the
                    # upload happened in the prefetch thread, overlapped
                    # with the previous step
                    inputs = dict(batch)
                else:
                    inputs = {}
                    for k, v in batch.items():
                        arr = jnp.asarray(v)
                        info = self.net.blob_infos.get(k)
                        if info is not None and info.nhwc and arr.ndim == 4:
                            arr = lay.to_physical(arr)
                        inputs[k] = arr
                if self.mesh is not None:
                    if "spatial" in self.mesh.axis_names:
                        # composed data x spatial mesh (parallel/mesh2d.py):
                        # batch over `data`, activations H-sharded — only
                        # arrays known to be physical NHWC get dim 1
                        # spatial-sharded
                        from ..parallel.mesh2d import shard_batch_2d

                        nhwc = {k for k, v in inputs.items()
                                if (i := self.net.blob_infos.get(k))
                                is not None and i.nhwc
                                and jnp.ndim(v) == 4}
                        inputs = shard_batch_2d(self.mesh, inputs,
                                                nhwc_keys=nhwc)
                    else:
                        from ..parallel.dp import shard_batch

                        inputs = shard_batch(self.mesh, inputs)
                (loss, (bn_aux, outs)), grads = self._grad(
                    self.net.params, inputs, jax.random.PRNGKey(self.it))
                self.last_outputs = outs
                if self._bn_meta:
                    # per-forward stat roll, like the reference (iter_size
                    # sub-batches each advance the moving averages)
                    self.net.params = self._bn_roll(self.net.params, bn_aux)
                total_loss = loss if total_loss is None else total_loss + loss
                grads_acc = (
                    grads
                    if grads_acc is None
                    else jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                )
            self.net.params, self.history = self._update(
                self.net.params, grads_acc, self.history, jnp.float32(lr), self.it
            )
            loss_val = float(total_loss) / int(self.sp.iter_size)
            self.smoothed_losses.append(loss_val)
            if len(self.smoothed_losses) > int(self.sp.average_loss):
                self.smoothed_losses.pop(0)
            self.it += 1
            if callback is not None:
                callback(self)
            if self.sp.snapshot and self.it % int(self.sp.snapshot) == 0 and self.sp.snapshot_prefix:
                self.snapshot()
        return loss_val

    def train_outputs(self) -> "Dict[str, np.ndarray]":
        """Output blobs of the last training forward, caffe layout
        (solver.cpp:243-277 reads net_->output_blobs() after Forward for
        the ``Train net output #k`` display; pycaffe reads net.blobs after
        step()).  Values come from the jitted step's aux channel — no
        extra forward, fetched only when called."""
        from ..ops import layout as lay

        out = {}
        for k, v in self.last_outputs.items():
            info = self.net.blob_infos.get(k)
            if info is not None and info.nhwc:
                v = lay.to_caffe(v)
            out[k] = np.asarray(jax.device_get(v))
        return out

    def display_outputs(self) -> None:
        """Print the reference's per-display result lines
        (solver.cpp:250-261): one line per output blob element, with the
        ``(* w = contribution loss)`` suffix for loss-weighted tops."""
        weights = dict(self.net.loss_tops())
        outs = self.train_outputs()
        j = 0
        for name in self.net.output_names():
            if name not in outs:
                continue
            vals = np.asarray(outs[name], np.float32).reshape(-1)
            w = weights.get(name, 0.0)
            for v in vals[:8]:  # reference prints every element; cap wide
                suffix = (f" (* {w:g} = {w * float(v):g} loss)" if w else "")
                print(f"    Train net output #{j}: {name} = "
                      f"{float(v):g}{suffix}")
                j += 1

    def test_all(self) -> Dict[str, float]:
        """Run every test net (Solver::TestAll); returns {blob: mean} of the
        last net for programmatic use."""
        scores: Dict[str, float] = {}
        for i in range(len(self.test_nets)):
            scores = self.test(i)
        return scores

    def test(self, test_net_id: int = 0) -> Dict[str, float]:
        """Solver::Test (solver.cpp:337-380): share trained weights by layer
        name, average output blobs over test_iter forwards."""
        net, data_fn, test_iter = self.test_nets[test_net_id]
        print(f"Iteration {self.it}, Testing net (#{test_net_id})")
        # ShareTrainedLayersWith: copy current train params by layer name
        for name, blobs in self.net.params.items():
            if name in net.params and len(net.params[name]) == len(blobs):
                net.params[name] = blobs
        totals: Dict[str, float] = {}
        for _ in range(max(1, int(test_iter))):
            inputs = data_fn(self.it) if data_fn is not None else {}
            out = net.forward(dict(inputs))
            for k, v in out.items():
                totals[k] = totals.get(k, 0.0) + float(np.mean(v))
        means = {k: v / max(1, int(test_iter)) for k, v in totals.items()}
        for j, (k, v) in enumerate(sorted(means.items())):
            print(f"    Test net output #{j}: {k} = {v:.6g}")
        return means

    @property
    def iter(self) -> int:
        """pycaffe/matcaffe alias for the iteration counter."""
        return self.it

    def solve(self) -> None:
        """Run to max_iter (Solver::Solve, solver.cpp:279)."""
        max_iter = int(self.sp.max_iter) if self.sp.has("max_iter") else 0
        while self.it < max_iter:
            self.step(1)

    @property
    def smoothed_loss(self) -> float:
        return float(np.mean(self.smoothed_losses)) if self.smoothed_losses else float("nan")

    # --------------------------------------------------- snapshot/restore

    def snapshot(self, prefix: Optional[str] = None) -> Tuple[str, str]:
        """Write .caffemodel + .solverstate (Solver::Snapshot, solver.cpp:412);
        ``snapshot_format: HDF5`` writes .caffemodel.h5/.solverstate.h5 like
        SnapshotSolverStateToHDF5 (sgd_solver.cpp:246-279)."""
        from ..proto import caffemodel as cm

        prefix = prefix or self.sp.snapshot_prefix
        if int(self.sp.snapshot_format) == 0:  # HDF5
            return self._snapshot_hdf5(prefix)
        model_path = f"{prefix}_iter_{self.it}.caffemodel"
        state_path = f"{prefix}_iter_{self.it}.solverstate"
        # atomic publish (tmp + rename): a crash mid-write must never leave
        # a torn file that a later --snapshot resume would trust
        self.net.save_caffemodel(model_path + ".tmp")
        os.replace(model_path + ".tmp", model_path)
        blobs = [cm.array_to_blob(a) for a in self._history_arrays()]
        cm.save_solver_state(
            {"iter": self.it, "learned_net": model_path, "history": blobs,
             "current_step": self.current_step},
            state_path + ".tmp",
        )
        os.replace(state_path + ".tmp", state_path)
        return model_path, state_path

    def _history_arrays(self):
        """Flatten history to caffe-layout arrays in param order (the
        order _load_history_arrays rebinds)."""
        out = []
        for hkey in sorted(self.history.keys()):
            for impl in self.net.impls:
                if impl.name not in self.history[hkey]:
                    continue
                for pi, h in zip(impl.params, self.history[hkey][impl.name]):
                    out.append(np.asarray(pi.export_caffe(
                        np.asarray(h))).reshape(pi.caffe_shape))
        return out

    def _snapshot_hdf5(self, prefix: str) -> Tuple[str, str]:
        import h5py

        model_path = f"{prefix}_iter_{self.it}.caffemodel.h5"
        state_path = f"{prefix}_iter_{self.it}.solverstate.h5"
        self.net.save_hdf5(model_path + ".tmp")
        os.replace(model_path + ".tmp", model_path)
        with h5py.File(state_path + ".tmp", "w") as f:
            f["iter"] = np.int64(self.it)
            f["learned_net"] = model_path
            f["current_step"] = np.int64(self.current_step)
            hist = f.create_group("history")
            for i, arr in enumerate(self._history_arrays()):
                hist[str(i)] = arr.astype(np.float32)
        os.replace(state_path + ".tmp", state_path)
        return model_path, state_path

    def _restore_hdf5(self, state_path: str) -> None:
        import h5py

        with h5py.File(state_path, "r") as f:
            self.it = int(np.asarray(f["iter"]))
            self.current_step = int(np.asarray(f["current_step"]))
            learned = f["learned_net"][()]
            if isinstance(learned, bytes):
                learned = learned.decode()
            blobs = [np.asarray(f["history"][str(i)])
                     for i in range(len(f["history"]))]
        if learned:
            self.net.load_hdf5(learned)
        self._load_history_arrays(blobs)

    def restore(self, state_path: str) -> None:
        from ..proto import caffemodel as cm

        if state_path.endswith((".h5", ".hdf5")):
            return self._restore_hdf5(state_path)
        st = cm.load_solver_state(state_path)
        sv = caffe_pb.view(st, "SolverState")
        self.it = int(sv.iter)
        self.current_step = int(sv.current_step)
        if sv.has("learned_net"):
            self.net.load_weights(sv.learned_net)
        blobs = [cm.blob_to_array(b) for b in st.get("history", [])]
        self._load_history_arrays(blobs)

    def _load_history_arrays(self, blobs) -> None:
        """Rebind flattened history blobs (caffe layout, param order)."""
        i = 0
        new_hist = {}
        for hkey in sorted(self.history.keys()):
            slot = {}
            for impl in self.net.impls:
                if impl.name not in self.history[hkey]:
                    continue
                arrs = []
                for pi in impl.params:
                    arrs.append(jnp.asarray(pi.import_caffe(blobs[i].reshape(pi.caffe_shape))))
                    i += 1
                slot[impl.name] = arrs
            new_hist[hkey] = slot
        self.history = new_hist
