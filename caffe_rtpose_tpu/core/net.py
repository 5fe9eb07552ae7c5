"""Net: prototxt-defined DAG -> one jit-compiled XLA program.

This replaces Caffe's Net graph runtime (reference src/caffe/net.cpp): where
the reference builds Blob/Layer objects and walks them per forward
(``Net::ForwardFromTo``, net.cpp:544-556), here construction specializes every
layer to its input shapes once (core.layers builders) and the whole forward is
a single traced function that XLA fuses and schedules — there is no per-layer
dispatch at run time and no analog of SyncedMemory (device residency is
managed by jax.Array).

Behavioral parity implemented here:
  * phase/stage/level filtering        (Net::FilterNet, net.cpp:287)
  * deprecated ``input``/``input_dim``/``input_shape`` fields + Input layers
  * in-place layers, multi-consumer blobs (InsertSplits is unnecessary in a
    functional graph)
  * weight loading by layer name with shape checks
    (Net::CopyTrainedLayersFromBinaryProto, net.cpp:750-806)
  * named blob/layer lookup, loss-weight accumulation
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import layout
from ..proto import caffe_pb, caffemodel, prototxt
from . import layers as L
from . import layers_extra  # noqa: F401  (registers additional layer types)

log = logging.getLogger(__name__)

from .data_layers import DATA_LAYER_TYPES  # noqa: E402


def _rule_matches(rule: caffe_pb.View, phase: int, stages: Sequence[str], level: int) -> bool:
    if rule.has("phase") and rule.phase != phase:
        return False
    if rule.has("min_level") and level < rule.min_level:
        return False
    if rule.has("max_level") and level > rule.max_level:
        return False
    for s in rule.stage:
        if s not in stages:
            return False
    for s in rule.not_stage:
        if s in stages:
            return False
    return True


def _layer_included(lv: caffe_pb.View, phase: int, stages: Sequence[str], level: int) -> bool:
    includes = lv.include
    excludes = lv.exclude
    if includes:
        return any(_rule_matches(r, phase, stages, level) for r in includes)
    return not any(_rule_matches(r, phase, stages, level) for r in excludes)


class Net:
    """Shape-specialized, jit-compiled network.

    Parameters
    ----------
    proto: path to .prototxt, prototxt text, or a parsed NetParameter dict.
    phase: 'TRAIN' or 'TEST'.
    input_shapes: optional {blob_name: caffe_shape} overriding declared input
        dims (the rtpose warmup reshape, rtpose.cpp:188-191).
    overrides: optional {layer_name: {field: value}} merged into layer param
        sub-messages before building (runtime knobs like ImResize
        start_scale/scale_gap, imresize_layer.hpp:23-28).
    dtype: activation dtype for inputs (bfloat16 recommended on TPU; conv
        accumulation is always float32).
    """

    def __init__(
        self,
        proto: Union[str, Dict[str, Any]],
        phase: str = "TEST",
        input_shapes: Optional[Dict[str, Sequence[int]]] = None,
        overrides: Optional[Dict[str, Dict[str, Any]]] = None,
        stages: Sequence[str] = (),
        level: Optional[int] = None,
        dtype=jnp.float32,
        seed: int = 0,
        remat: str = "none",
    ):
        """``remat``: gradient rematerialization policy — 'none' (default),
        or 'convs' (wrap Convolution/Deconvolution applies in
        ``jax.checkpoint`` so their activations are recomputed in the
        backward pass instead of stored; trades ~30% extra forward FLOPs for
        a large activation-memory cut on deep training graphs)."""
        if isinstance(proto, str):
            if "\n" in proto or "{" in proto:
                net_param = prototxt.parse(proto)
            else:
                net_param = prototxt.parse_file(proto)
        else:
            net_param = proto
        if net_param.get("layers"):
            # legacy V0/V1 prototxt: run the UpgradeNetAsNeeded chain
            # (reference upgrade_proto.cpp:20-76) before building; deep
            # copy — the upgrade pops fields out of nested layer dicts and
            # must not mutate the caller's proto
            import copy

            from ..proto.upgrade import upgrade_net_as_needed

            net_param = upgrade_net_as_needed(copy.deepcopy(net_param))
        self.net_param = net_param
        self.phase = phase
        self.dtype = dtype
        if remat not in ("none", "convs"):
            raise ValueError(f"unknown remat policy {remat!r}")
        self.remat = remat
        nv = caffe_pb.view(net_param, "NetParameter")
        self.name = nv.name
        # NetParameter.state merges UNDER the caller's NetState: caller
        # stages APPEND to net.state stages (net.cpp constructor add_stage
        # after the file's state; solver.cpp:99-103 MergeFrom order).  The
        # phase argument always wins (net.cpp constructor set_phase).
        # Level semantics: an EXPLICIT caller level — any int, including 0 —
        # overrides net.state.level, because the Net(file, phase, level)
        # constructor unconditionally set_level(level) (net.cpp:44).
        # level=None models the solver MergeFrom path, deferring to the
        # file's state.level.
        state = net_param.get("state")
        if state:
            stages = list(state.get("stage", [])) + list(stages)
            if level is None:
                level = int(state.get("level", 0))
        level = 0 if level is None else int(level)
        phase_i = caffe_pb.PHASE[phase]

        # ---- collect graph inputs
        self.input_names: List[str] = []
        input_infos: Dict[str, L.BlobInfo] = {}
        declared: Dict[str, Tuple[int, ...]] = {}
        if nv.input:
            shapes: List[Tuple[int, ...]] = []
            if nv.input_shape:
                shapes = [tuple(int(d) for d in bs.dim) for bs in nv.input_shape]
            elif nv.input_dim:
                dims = [int(d) for d in nv.input_dim]
                shapes = [tuple(dims[i : i + 4]) for i in range(0, len(dims), 4)]
            for iname, shp in zip(nv.input, shapes):
                declared[iname] = shp

        # ---- filter layers & apply overrides
        overrides = overrides or {}
        self.layer_views: List[caffe_pb.View] = []
        for raw in net_param.get("layer", []):
            lv = caffe_pb.view(raw, "LayerParameter")
            if not _layer_included(lv, phase_i, stages, level):
                continue
            if lv.name in overrides:
                patched = dict(raw)
                for k, v in overrides[lv.name].items():
                    # field path: '<param_msg>.<field>' or direct layer field
                    if "." in k:
                        sub, fld = k.split(".", 1)
                        patched[sub] = dict(patched.get(sub, {}))
                        patched[sub][fld] = v
                    else:
                        patched[k] = v
                lv = caffe_pb.view(patched, "LayerParameter")
            self.layer_views.append(lv)

        # Input layers declare shapes too; data layers become bound host
        # sources whose tops are fed as inputs each forward (see
        # core/data_layers.py for the TPU-first rationale)
        self.data_layers: List[Any] = []
        self._data_top_to_layer: Dict[str, Any] = {}
        for lv in self.layer_views:
            if lv.type == "Input":
                for i, t in enumerate(lv.top):
                    shp = tuple(int(d) for d in lv.input_param.shape[min(i, len(lv.input_param.shape) - 1)].dim)
                    declared[t] = shp
            elif lv.type in DATA_LAYER_TYPES:
                from . import data_layers as DL

                dl = DL.build(lv, phase)
                self.data_layers.append(dl)
                for t in dl.tops:
                    declared[t] = dl.top_shapes[t]
                    self._data_top_to_layer[t] = dl

        if input_shapes:
            for k, v in input_shapes.items():
                declared[k] = tuple(int(d) for d in v)

        for iname, shp in declared.items():
            nhwc = len(shp) == 4
            input_infos[iname] = L.BlobInfo(
                shape_physical=layout.physical_shape_of(shp) if nhwc else tuple(shp), nhwc=nhwc
            )
            self.input_names.append(iname)

        # ---- build layer impls with incremental shape inference
        self.impls: List[L.LayerImpl] = []
        blob_infos: Dict[str, L.BlobInfo] = dict(input_infos)
        self.blob_infos = blob_infos
        rngc = [0]
        for lv in self.layer_views:
            if lv.type == "Input" or lv.type in DATA_LAYER_TYPES:
                continue
            bottoms = []
            for b in lv.bottom:
                if b not in blob_infos:
                    raise ValueError(f"layer {lv.name}: unknown bottom blob {b!r}")
                bottoms.append(blob_infos[b])
            impl = L.build(lv, bottoms, phase)
            # infer top shapes via abstract evaluation
            bot_avals = [
                jax.ShapeDtypeStruct(bi.shape_physical, dtype if bi.nhwc else jnp.float32)
                for bi in bottoms
            ]
            dummy_params = [
                jax.ShapeDtypeStruct(_internal_shape(pi), jnp.float32) for pi in impl.params
            ]
            rng_aval = jax.ShapeDtypeStruct((2,), jnp.uint32)
            out_avals = jax.eval_shape(
                lambda p, bots, rng: impl.apply(p, bots, rng, phase == "TRAIN", None),
                dummy_params,
                bot_avals,
                rng_aval,
            )
            flags = impl.top_nhwc
            for i, (tname, aval) in enumerate(zip(impl.tops, out_avals)):
                nhwc = (len(aval.shape) == 4) if flags is None else flags[i]
                blob_infos[tname] = L.BlobInfo(shape_physical=tuple(aval.shape), nhwc=nhwc)
            self.impls.append(impl)

        self.layer_by_name: Dict[str, L.LayerImpl] = {i.name: i for i in self.impls}
        self.params = self.init_params(seed)
        self._jit_cache: Dict[Any, Any] = {}
        # memory accounting (Net::Init logging, net.cpp:163-166) — upper
        # bound: under XLA most intermediates are fused away or reused
        self.memory_used = 4 * sum(
            int(np.prod(bi.shape_physical)) for bi in blob_infos.values()
        )
        param_bytes = 4 * sum(
            int(np.prod(pi.caffe_shape)) for impl in self.impls for pi in impl.params
        )
        log.info("Memory required for data (upper bound): %d; params: %d",
                 self.memory_used, param_bytes)

    # ------------------------------------------------------------- params

    def init_params(self, seed: int = 0) -> Dict[str, List[jax.Array]]:
        key = jax.random.PRNGKey(seed)
        params: Dict[str, List[jax.Array]] = {}
        for impl in self.impls:
            if not impl.params:
                continue
            keys = jax.random.split(key, len(impl.params) + 1)
            key = keys[0]
            params[impl.name] = [pi.init(k) for pi, k in zip(impl.params, keys[1:])]
        return params

    def load_weights(self, path_or_dict: Union[str, Dict[str, List[np.ndarray]]]) -> int:
        """Load .caffemodel weights by layer name (net.cpp:750-806). Returns
        the number of layers whose params were copied."""
        weights = (
            caffemodel.load_weights(path_or_dict) if isinstance(path_or_dict, str) else path_or_dict
        )
        copied = 0
        for name, blobs in weights.items():
            impl = self.layer_by_name.get(name)
            if impl is None or not impl.params:
                log.info("Ignoring source layer %s", name)
                continue
            if len(blobs) != len(impl.params):
                raise ValueError(
                    f"layer {name}: incompatible param count {len(blobs)} vs {len(impl.params)}"
                )
            new = []
            for pi, arr in zip(impl.params, blobs):
                want = int(np.prod(pi.caffe_shape))
                if arr.size != want:
                    raise ValueError(
                        f"layer {name}: param size mismatch {arr.shape} vs caffe shape {pi.caffe_shape}"
                    )
                new.append(jnp.asarray(pi.import_caffe(np.asarray(arr, np.float32).reshape(pi.caffe_shape))))
            self.params[name] = new
            copied += 1
        return copied

    def export_weights(self) -> Dict[str, List[np.ndarray]]:
        out: Dict[str, List[np.ndarray]] = {}
        for impl in self.impls:
            if impl.name in self.params:
                out[impl.name] = [
                    np.asarray(pi.export_caffe(np.asarray(p))).reshape(pi.caffe_shape)
                    for pi, p in zip(impl.params, self.params[impl.name])
                ]
        return out

    def save_caffemodel(self, path: str) -> None:
        """Snapshot weights as a binary NetParameter (.caffemodel parity)."""
        layers = []
        for name, blobs in self.export_weights().items():
            layers.append(
                {
                    "name": name,
                    "type": self.layer_by_name[name].type,
                    "blobs": [caffemodel.array_to_blob(b) for b in blobs],
                }
            )
        caffemodel.save_net_parameter({"name": self.name, "layer": layers}, path)

    def save_hdf5(self, path: str) -> None:
        """HDF5 weight snapshot (Net::ToHDF5, net.cpp: group 'data' with one
        group per layer, datasets '0','1',... in caffe layout)."""
        import h5py

        with h5py.File(path, "w") as f:
            grp = f.create_group("data")
            for name, blobs in self.export_weights().items():
                lg = grp.create_group(name)
                for i, arr in enumerate(blobs):
                    lg.create_dataset(str(i), data=arr)

    def load_hdf5(self, path: str) -> int:
        """Net::CopyTrainedLayersFromHDF5 parity: match groups by layer name."""
        import h5py

        copied = 0
        with h5py.File(path, "r") as f:
            grp = f["data"]
            weights = {
                name: [np.asarray(lg[str(i)]) for i in range(len(lg))]
                for name, lg in grp.items()
            }
        return self.load_weights(weights)

    # ------------------------------------------------------------ forward

    def prune_for(self, outputs: Sequence[str]) -> List[Any]:
        """Dead-layer elimination: the impl subsequence needed to produce
        ``outputs`` (keeps in-place chains intact by blob-name dependency)."""
        needed = set(outputs)
        keep: List[Any] = []
        for impl in reversed(self.impls):
            if any(t in needed for t in impl.tops):
                keep.append(impl)
                needed |= set(impl.bottoms)
        keep.reverse()
        return keep

    def _apply(self, params, inputs: Dict[str, jax.Array], rng, knobs, training: bool,
               impls: Optional[List[Any]] = None,
               aux_out: Optional[Dict[str, Any]] = None):
        blobs: Dict[str, jax.Array] = dict(inputs)
        remat_types = {"Convolution", "Deconvolution"} if self.remat == "convs" else ()
        for impl in (impls if impls is not None else self.impls):
            bots = [blobs[b] for b in impl.bottoms]
            p = params.get(impl.name, [])
            if aux_out is not None and training and impl.aux_apply is not None:
                tops, aux = impl.aux_apply(p, bots, rng, training, knobs)
                aux_out[impl.name] = aux
            elif impl.type == "Dropout" or impl.needs_rng:
                rng, sub = jax.random.split(rng)
                tops = impl.apply(p, bots, sub, training, knobs)
            elif impl.type in remat_types and training:
                tops = jax.checkpoint(
                    lambda pp, bb, _impl=impl: _impl.apply(pp, bb, rng, training, knobs)
                )(p, bots)
            else:
                tops = impl.apply(p, bots, rng, training, knobs)
            for tname, t in zip(impl.tops, tops):
                blobs[tname] = t
        return blobs

    def make_forward(self, outputs: Optional[Sequence[str]] = None, donate: bool = False):
        """Return a jitted fn(params, inputs_dict, rng, knobs) -> {name: array}
        producing physical-layout outputs."""
        out_names = list(outputs) if outputs else self.output_names()
        training = self.phase == "TRAIN"

        def fwd(params, inputs, rng, knobs):
            blobs = self._apply(params, inputs, rng, knobs, training)
            return {k: blobs[k] for k in out_names}

        return jax.jit(fwd)

    def output_names(self) -> List[str]:
        # deterministic production order (inputs, then tops in layer
        # order), matching the reference's blob-id ordering of net
        # outputs (net.cpp AppendTop order) — a set here would make
        # "Train net output #k" numbering vary across runs
        consumed = set()
        for impl in self.impls:
            inplace = set(impl.tops) & set(impl.bottoms)
            consumed |= set(impl.bottoms) - inplace
        ordered, seen = [], set()
        for b in list(self.input_names) + [t for impl in self.impls
                                           for t in impl.tops]:
            if b not in seen:
                seen.add(b)
                if b not in consumed:
                    ordered.append(b)
        return ordered

    def forward(
        self,
        inputs: Optional[Dict[str, np.ndarray]] = None,
        outputs: Optional[Sequence[str]] = None,
        knobs: Optional[Dict[str, Any]] = None,
        rng: Optional[jax.Array] = None,
        caffe_layout: bool = True,
        **kw_inputs,
    ) -> Dict[str, np.ndarray]:
        """Convenience forward taking/returning caffe-layout (NCHW) arrays."""
        inputs = dict(inputs or {})
        inputs.update(kw_inputs)
        phys: Dict[str, jax.Array] = {}
        pulled: Dict[Any, Dict[str, np.ndarray]] = {}
        for name in self.input_names:
            if name not in inputs and name in self._data_top_to_layer:
                # bound data layer: pull the next prefetched batch (one pull
                # per layer per forward, shared across its tops)
                dl = self._data_top_to_layer[name]
                if dl not in pulled:
                    pulled[dl] = dl.next_batch()
                inputs[name] = pulled[dl][name]
            if name not in inputs:
                raise ValueError(f"missing input blob {name!r}")
            arr = jnp.asarray(inputs[name])
            info = self.blob_infos[name]
            if info.nhwc:
                arr = layout.to_physical(arr).astype(self.dtype)
            phys[name] = arr
        # HDF5Output layers: fetch their bottoms and append to the file
        h5_outputs = [(i.hdf5_output_file, i.bottoms) for i in self.impls
                      if getattr(i, "hdf5_output_file", None)]
        eff_outputs = outputs
        if h5_outputs:
            eff_outputs = list(outputs or self.output_names())
            for _, bots in h5_outputs:
                eff_outputs.extend(b for b in bots if b not in eff_outputs)
        key = ("fwd", tuple(eff_outputs) if eff_outputs else None)
        if key not in self._jit_cache:
            self._jit_cache[key] = self.make_forward(eff_outputs)
        fn = self._jit_cache[key]
        knobs_t = {k: jnp.asarray(v, jnp.float32) for k, v in (knobs or {}).items()} or None
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        out = fn(self.params, phys, rng, knobs_t)
        if h5_outputs:
            self._write_hdf5_outputs(h5_outputs, out)
        result = {}
        for k, v in out.items():
            info = self.blob_infos.get(k)
            if caffe_layout and info is not None and info.nhwc:
                v = layout.to_caffe(v)
            result[k] = np.asarray(jax.device_get(v))
        return result

    def _write_hdf5_outputs(self, h5_outputs, blobs) -> None:
        """Append named blobs to HDF5 files (hdf5_output_layer.cpp parity:
        each forward appends a batch)."""
        import h5py

        for path, bots in h5_outputs:
            with h5py.File(path, "a") as f:
                for b in bots:
                    arr = blobs[b]
                    info = self.blob_infos.get(b)
                    if info is not None and info.nhwc:
                        arr = layout.to_caffe(arr)
                    arr = np.asarray(jax.device_get(arr))
                    if b in f:
                        ds = f[b]
                        n = ds.shape[0]
                        ds.resize(n + arr.shape[0], axis=0)
                        ds[n:] = arr
                    else:
                        f.create_dataset(b, data=arr, maxshape=(None,) + arr.shape[1:])

    def update_bn_stats(self, next_batch, n_batches: int = 10) -> int:
        """Recompute BatchNorm running statistics from data.

        Training through ``Solver`` already rolls the reference's moving
        averages every forward (batch_norm_layer.cpp:120-136 semantics via
        the aux channel — see ``make_loss_fn(with_aux=True)`` and
        ``Solver._bn_roll``), so snapshots carry caffe-equivalent stats.
        This post-hoc recompute remains for nets trained outside Solver or
        imported without stats: run ``n_batches`` forwards, average each BN
        bottom's batch mean/variance, and write them (with scale factor 1)
        into the layer's stat blobs.  ``next_batch(i) -> {input: array}``.
        Returns the number of BatchNorm layers updated."""
        bn = [i for i in self.impls if i.type == "BatchNorm"]
        if not bn:
            return 0
        # front-to-back (impls are topological): each BN's stats must be
        # measured AFTER every upstream BN already has correct stats —
        # otherwise a stacked BN records statistics of garbage-scaled input
        for impl in bn:
            b = impl.bottoms[0]
            s = sq = 0.0
            for it in range(n_batches):
                out = self.forward(dict(next_batch(it)), outputs=[b])
                arr = np.asarray(out[b], np.float64)
                axes = (0, 2, 3) if arr.ndim == 4 else tuple(
                    d for d in range(arr.ndim) if d != 1)
                s = s + arr.mean(axis=axes)
                sq = sq + (arr ** 2).mean(axis=axes)
            mean = (s / n_batches).astype(np.float32)
            var = (sq / n_batches - (s / n_batches) ** 2).astype(np.float32)
            self.params[impl.name] = [
                jnp.asarray(mean), jnp.asarray(np.maximum(var, 0.0)),
                jnp.asarray([1.0], jnp.float32),
            ]
        return len(bn)

    def set_input_arrays(self, data: np.ndarray, labels: Optional[np.ndarray] = None) -> None:
        """Bind arrays to the net's MemoryData layer (pycaffe
        Net.set_input_arrays / memory_data_layer.cpp:Reset)."""
        from .data_layers import MemoryDataLayer

        for dl in self.data_layers:
            if isinstance(dl, MemoryDataLayer):
                dl.set_arrays(data, labels)
                return
        raise ValueError("net has no MemoryData layer")

    def blob_shape(self, name: str) -> Tuple[int, ...]:
        return self.blob_infos[name].shape_caffe

    # loss helpers ------------------------------------------------------

    def loss_tops(self) -> List[Tuple[str, float]]:
        out = []
        for impl in self.impls:
            for i, t in enumerate(impl.tops):
                w = impl.loss_weights[i] if i < len(impl.loss_weights) else 0.0
                if w:
                    out.append((t, float(w)))
        return out

    def make_loss_fn(self, with_aux: bool = False, with_outputs: bool = False):
        """fn(params, inputs, rng) -> scalar total weighted loss.  With
        ``with_aux``, returns (loss, {layer: aux}) — the side channel for
        stat-carrying layers (BatchNorm batch mean/var in TRAIN).  With
        ``with_outputs``, the return becomes
        ``(loss, (aux_or_None, {output_blob: physical array}))`` — the
        net's output blobs from the SAME forward, free for the caller
        since XLA computes them on the loss path anyway.  Feeds the
        reference's per-iteration result display (solver.cpp:243-277
        ``Train net output #k``) and pycaffe's read-blobs-after-step
        idiom without an extra forward."""
        tops = self.loss_tops()
        if not tops:
            raise ValueError("net has no loss tops")
        training = self.phase == "TRAIN"
        out_names = self.output_names() if with_outputs else []

        def loss_fn(params, inputs, rng):
            aux: Optional[Dict[str, Any]] = {} if with_aux else None
            blobs = self._apply(params, inputs, rng, None, training,
                                aux_out=aux)
            total = 0.0
            for t, w in tops:
                total = total + w * jnp.sum(blobs[t])
            if with_outputs:
                # skip declared-but-unfed inputs (e.g. consumed only by a
                # phase-excluded layer): they are output_names() members
                # but absent from this forward's blob dict
                return total, (aux, {k: blobs[k] for k in out_names
                                     if k in blobs})
            return (total, aux) if with_aux else total

        return loss_fn


def _internal_shape(pi: L.ParamInfo) -> Tuple[int, ...]:
    """Shape of the internal (imported) param for abstract evaluation."""
    probe = np.zeros(pi.caffe_shape, np.float32)
    return tuple(np.asarray(pi.import_caffe(probe)).shape)
