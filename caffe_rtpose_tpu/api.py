"""pycaffe-compatible API surface (reference python/caffe/: pycaffe.py,
classifier.py, detector.py, io.py, draw.py).

    from caffe_rtpose_tpu import api as caffe
    net = caffe.Net(proto, weights, caffe.TEST)
    out = net.forward(data=batch)          # {output_name: ndarray}
    net.blobs['conv1'].data                # activations (caffe NCHW layout)
    net.params['conv1'][0].data            # weights (caffe layout)
    diffs = net.backward(loss=np.ones(())) # bottom/input gradients
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import coord_map  # noqa: F401  (caffe.coord_map parity)
from . import proto  # noqa: F401  (caffe.proto.caffe_pb2 parity, lazy)
from .core import net_spec  # noqa: F401  (caffe.net_spec parity)
from .core.net import Net as _CoreNet
from .core.net_spec import L as layers  # noqa: F401  (caffe.layers parity)
from .core.net_spec import NetSpec  # noqa: F401
from .core.net_spec import params  # noqa: F401  (caffe.params / P parity)
from .ops import layout

TRAIN = "TRAIN"
TEST = "TEST"

# ---------------------------------------------------------------- singleton
# Caffe-singleton shims (_caffe.cpp:286-291 / common.hpp:102-183).  Mode
# maps onto the JAX default device: cpu <-> the host backend, gpu <-> the
# accelerator backend (TPU here); device indexing picks within the
# accelerator's device list.

_default_seed: Optional[int] = None
_device_index = 0


def _accel_devices():
    import jax

    dv = [d for d in jax.devices() if d.platform != "cpu"]
    return dv or jax.devices()


def set_mode_cpu() -> None:
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def set_mode_gpu() -> None:
    import jax

    dv = _accel_devices()
    jax.config.update("jax_default_device", dv[_device_index % len(dv)])


def set_device(device_id: int) -> None:
    global _device_index
    _device_index = int(device_id)
    import jax

    dv = _accel_devices()
    if dv[0].platform != "cpu":
        jax.config.update("jax_default_device", dv[_device_index % len(dv)])


def set_random_seed(seed: int) -> None:
    """Caffe::set_random_seed: seeds weight init (new Nets draw from a
    stream derived from this seed — the reference seeds one global RNG
    whose stream ADVANCES, so two Nets built after one seeding get
    different inits) and the host-side rng."""
    global _default_seed
    _default_seed = int(seed)
    np.random.seed(int(seed) % (2 ** 32))


def _next_net_seed() -> Optional[int]:
    """Consume one value from the seeded init stream (None = unseeded)."""
    global _default_seed
    if _default_seed is None:
        return None
    s = _default_seed
    _default_seed = (s * 6364136223846793005 + 1442695040888963407) % (2 ** 31)
    return s


def layer_type_list() -> List[str]:
    """caffe.layer_type_list() (LayerRegistry::LayerTypeList)."""
    from .core.data_layers import DATA_LAYER_TYPES
    from .core.layers import REGISTRY

    return sorted(set(REGISTRY) | set(DATA_LAYER_TYPES))


class _Blob:
    """pycaffe Blob facade: .data / .diff / .shape."""

    def __init__(self, shape):
        self._shape = tuple(int(d) for d in shape)
        self._data = np.zeros(self._shape, np.float32)
        self._pending_data = None
        self.diff = np.zeros(self._shape, np.float32)

    @property
    def data(self):
        if self._pending_data is not None:
            thunk, self._pending_data = self._pending_data, None
            self._data = thunk()
        return self._data

    @data.setter
    def data(self, value):
        self._pending_data = None
        self._data = value

    def _set_pending(self, thunk) -> None:
        """Defer .data to ``thunk()`` until first read — keeps
        solver.step() free of per-iteration device fetches while
        preserving the read-blobs-after-step idiom."""
        self._pending_data = thunk

    @property
    def shape(self):
        return self._shape

    @property
    def num(self):
        return self._shape[0]

    @property
    def channels(self):
        return self._shape[1] if len(self._shape) > 1 else 1

    def reshape(self, *shape):
        self._shape = tuple(int(d) for d in shape)
        self.data = np.zeros(self._shape, np.float32)
        self.diff = np.zeros(self._shape, np.float32)

    def reshape_dims(self, dims) -> None:
        """reshape() taking one sequence — used by the MATLAB bridge."""
        self.reshape(*[int(d) for d in np.asarray(dims).reshape(-1)])


class Net:
    """pycaffe-style wrapper over the jitted graph runtime."""

    def __init__(self, prototxt: str, weights: Optional[str] = None, phase: str = TEST,
                 fetch_all_blobs: bool = True, **kw):
        """``fetch_all_blobs``: pycaffe semantics refresh EVERY net.blobs[*]
        .data after forward (the reference aliases device memory; we must
        transfer).  Pass False to fetch only outputs + requested blobs —
        much faster for big nets, at the cost of stale intermediate
        facades."""
        if weights in (TRAIN, TEST):  # Net(proto, phase) signature
            phase, weights = weights, None
        if isinstance(prototxt, _CoreNet):
            # facade over an EXISTING core net (shared params) — the
            # matcaffe Solver exposes its train/test nets this way, like
            # the reference's construct-from-handle path (Net.m there)
            self._proto, self._phase, self._kw = None, prototxt.phase, {}
            self._fetch_all = bool(fetch_all_blobs)
            self._net = prototxt
            self._init_facades()
            return
        if _default_seed is not None and "seed" not in kw:
            kw["seed"] = _next_net_seed()  # caffe.set_random_seed stream
        # pycaffe's Net ctor forwards level (default 0) into the
        # Net(file, phase, level) constructor, which unconditionally
        # overrides a prototxt state.level (net.cpp:44)
        kw.setdefault("level", 0)
        self._proto, self._phase, self._kw = prototxt, phase, dict(kw)
        self._fetch_all = bool(fetch_all_blobs)
        self._net = _CoreNet(prototxt, phase=phase, **kw)
        self._init_facades()
        if weights:
            self.copy_from(weights)

    def _init_facades(self) -> None:
        self.blobs: "OrderedDict[str, _Blob]" = OrderedDict()
        for name, info in self._net.blob_infos.items():
            self.blobs[name] = _Blob(info.shape_caffe)
        self._params_stale = False
        self._params_dict: "OrderedDict[str, List[_Blob]]" = OrderedDict()
        for impl in self._net.impls:
            if impl.params:
                blobs = []
                for pi, arr in zip(impl.params, self._net.params[impl.name]):
                    b = _Blob(pi.caffe_shape)
                    b.data = np.array(pi.export_caffe(np.asarray(arr))).reshape(pi.caffe_shape).copy()
                    blobs.append(b)
                self._params_dict[impl.name] = blobs
        if self._proto is None:
            # solver-owned facade: baseline snapshot for _push_params's
            # user-edit detection
            self._synced_params = {
                name: [b.data.copy() for b in blobs]
                for name, blobs in self.params.items()
            }

    # ------------------------------------------------------------- pycaffe

    @property
    def params(self) -> "OrderedDict[str, List[_Blob]]":
        """Layer-name → param _Blob list.  Reference pycaffe params alias
        live device memory; here a facade marked stale (after a solver
        step updated the core net) is re-pulled on first access, so reads
        are always current and edits land on fresh values."""
        if self._params_stale:
            self._refresh_params()
        return self._params_dict

    def _mark_params_stale(self) -> None:
        self._params_stale = True

    @property
    def inputs(self) -> List[str]:
        # data-layer tops are not user-facing inputs (pycaffe net.inputs
        # lists only net_input_blobs_, net.cpp:AppendTop input handling)
        return [n for n in self._net.input_names
                if n not in self._net._data_top_to_layer]

    @property
    def outputs(self) -> List[str]:
        return self._net.output_names()

    def copy_from(self, weights_path: str) -> None:
        self._net.load_weights(weights_path)
        self._refresh_params()

    def save(self, path: str) -> None:
        self._push_params()
        self._net.save_caffemodel(path)

    def set_input_arrays(self, data: np.ndarray, labels: Optional[np.ndarray] = None) -> None:
        """Bind arrays to the MemoryData layer (pycaffe Net.set_input_arrays)."""
        self._net.set_input_arrays(data, labels)

    def clear_param_diffs(self) -> None:
        """Net::ClearParamDiffs: zeroes LEARNABLE PARAM diffs only —
        activation-blob diffs are untouched (net.cpp ClearParamDiffs
        iterates learnable_params_)."""
        for blobs in self.params.values():
            for b in blobs:
                b.diff[...] = 0.0

    def share_with(self, other: "Net") -> None:
        """Net::ShareTrainedLayersWith: adopt the other net's params for
        layers with matching names (weights copied — jax arrays are
        immutable, so 'sharing' is value semantics here)."""
        other._push_params()
        weights = {name: [np.asarray(b.data, np.float32).reshape(-1)
                          for b in blobs]
                   for name, blobs in other.params.items()
                   if name in self.params}
        self._net.load_weights(weights)
        self._refresh_params()

    def save_hdf5(self, path: str) -> None:
        self._push_params()
        self._net.save_hdf5(path)

    def load_hdf5(self, path: str) -> None:
        self._net.load_hdf5(path)
        self._refresh_params()

    def reshape(self) -> None:
        """Apply user edits of input blob shapes (pycaffe pattern:
        ``net.blobs['data'].reshape(...); net.reshape()``).  Under XLA a new
        input shape means a new compiled program, so the graph is rebuilt
        with the current weights carried over by name."""
        shapes = {n: tuple(self.blobs[n].shape) for n in self.inputs}
        old = self._net
        if all(shapes[n] == old.blob_infos[n].shape_caffe for n in shapes):
            return
        if self._proto is None:
            raise RuntimeError("cannot reshape a facade over a solver-owned "
                               "net (no source prototxt to rebuild from)")
        kw = dict(self._kw)
        kw["input_shapes"] = {**kw.get("input_shapes", {}), **shapes}
        self._push_params()
        weights = {
            name: [np.asarray(b.data, np.float32).reshape(-1) for b in blobs]
            for name, blobs in self.params.items()
        }
        self._net = _CoreNet(self._proto, phase=self._phase, **kw)
        self._net.load_weights(weights)
        saved = {n: b for n, b in self.blobs.items()}
        self.blobs.clear()
        for name, info in self._net.blob_infos.items():
            b = saved.get(name) or _Blob(info.shape_caffe)
            if name not in shapes and b.shape != info.shape_caffe:
                b.reshape(*info.shape_caffe)
            self.blobs[name] = b
        self._refresh_params()

    def _refresh_params(self) -> None:
        self._params_stale = False
        for name, blobs in self._params_dict.items():
            impl = self._net.layer_by_name[name]
            for pi, arr, b in zip(impl.params, self._net.params[name], blobs):
                b.data = np.array(pi.export_caffe(np.asarray(arr))).reshape(pi.caffe_shape).copy()
        if self._proto is None:
            # solver-owned facade: remember what we handed the user so
            # _push_params can tell their edits from training updates
            self._synced_params = {
                name: [b.data.copy() for b in blobs]
                for name, blobs in self.params.items()
            }

    def _push_params(self) -> None:
        """Write user edits of net.params[...][i].data back to the runtime."""
        import jax.numpy as jnp

        if self._proto is None:
            # facade over a live core net (matcaffe solver.net): the core is
            # authoritative — a training step updates it behind the facade,
            # so blind-pushing the facade's snapshot would clobber learned
            # weights.  But user edits must still write through (reference
            # pycaffe/matcaffe params alias the shared blobs): push exactly
            # the params whose facade contents changed since the last sync,
            # then pull everything.
            if self._params_stale:
                return  # a stale facade cannot hold user edits: every edit
                        # path reads through the params property, which
                        # refreshes first
            synced = getattr(self, "_synced_params", None)
            pushed = False
            if synced is not None:
                for name, blobs in self._params_dict.items():
                    ref = synced.get(name, [])
                    impl = self._net.layer_by_name[name]
                    new = None
                    for i, b in enumerate(blobs):
                        cur = np.asarray(b.data, np.float32)
                        if i < len(ref) and np.array_equal(cur, ref[i]):
                            continue
                        if new is None:
                            new = list(self._net.params[name])
                        new[i] = jnp.asarray(impl.params[i].import_caffe(cur))
                    if new is not None:
                        self._net.params[name] = new
                        pushed = True
            if pushed:
                self._refresh_params()
            return
        for name, blobs in self.params.items():
            impl = self._net.layer_by_name[name]
            self._net.params[name] = [
                jnp.asarray(pi.import_caffe(np.asarray(b.data, np.float32)))
                for pi, b in zip(impl.params, blobs)
            ]

    def forward(self, blobs: Optional[Sequence[str]] = None, **inputs) -> Dict[str, np.ndarray]:
        """Run forward; returns output blobs (+ requested extra blobs);
        refreshes .blobs[*].data (pycaffe _Net_forward semantics)."""
        self._push_params()
        for name in self.inputs:
            # data-layer tops are auto-pulled from their bound source
            if name not in inputs and name not in self._net._data_top_to_layer:
                inputs[name] = self.blobs[name].data
        want = list(self.outputs) + [b for b in (blobs or []) if b not in self.outputs]
        # data-layer tops are always fetched: backward() rebuilds its inputs
        # from the blob facades, so they must reflect the consumed batch
        extra = (list(self._net.blob_infos.keys()) if self._fetch_all
                 else list(self._net._data_top_to_layer.keys()))
        fetch = list(dict.fromkeys(want + extra))
        out = self._net.forward(inputs, outputs=fetch)
        for name, arr in out.items():
            if name in self.blobs:
                self.blobs[name].data = arr
        for name, arr in inputs.items():
            self.blobs[name].data = np.asarray(arr)
        return {k: out[k] for k in want}

    def forward_dict(self, inputs: Dict[str, np.ndarray],
                     blobs: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
        """forward() taking a plain dict — used by the MATLAB bridge
        (matlab/+caffe/Net.m), where **kwargs cannot be expressed."""
        return self.forward(blobs=blobs, **{str(k): np.asarray(v) for k, v in inputs.items()})

    def backward_dict(self, top_diffs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """backward() taking a plain dict — used by the MATLAB bridge."""
        return self.backward(**{str(k): np.asarray(v) for k, v in top_diffs.items()})

    def backward(self, **top_diffs) -> Dict[str, np.ndarray]:
        """Gradients of sum(top * top_diff) wrt graph inputs and params;
        fills .blobs[input].diff and .params[*][i].diff."""
        import jax
        import jax.numpy as jnp

        self._push_params()
        # data-layer tops are not in self.inputs; reuse the batch the last
        # forward() cached into their blob facades
        inputs = {name: self.blobs[name].data for name in self._net.input_names}
        diffs = {k: jnp.asarray(v, jnp.float32) for k, v in top_diffs.items()}
        net = self._net

        phys_inputs = {}
        for name in net.input_names:
            arr = jnp.asarray(inputs[name])
            if net.blob_infos[name].nhwc and arr.ndim == 4:
                arr = layout.to_physical(arr)
            phys_inputs[name] = arr.astype(jnp.float32)

        def scalar(params, phys):
            blobs = net._apply(params, phys, jax.random.PRNGKey(0), None, net.phase == "TRAIN")
            total = 0.0
            for k, d in diffs.items():
                v = blobs[k]
                info = net.blob_infos.get(k)
                dv = jnp.asarray(d)
                if info is not None and info.nhwc and dv.ndim == 4:
                    dv = layout.to_physical(dv)
                total = total + jnp.sum(v.astype(jnp.float32) * jnp.broadcast_to(dv, v.shape))
            return total

        gp, gi = jax.grad(scalar, argnums=(0, 1))(net.params, phys_inputs)
        out: Dict[str, np.ndarray] = {}
        for name, g in gi.items():
            info = net.blob_infos[name]
            arr = np.asarray(g)
            if info.nhwc and arr.ndim == 4:
                arr = np.asarray(layout.to_caffe(arr))
            self.blobs[name].diff = arr
            out[name] = arr
        for name, blobs_ in self.params.items():
            impl = net.layer_by_name[name]
            for pi, b, g in zip(impl.params, blobs_, gp.get(name, [])):
                b.diff = np.asarray(pi.export_caffe(np.asarray(g))).reshape(pi.caffe_shape)
        return out

    def forward_all(self, blobs=None, **kwargs) -> Dict[str, np.ndarray]:
        """Batched forward over all inputs (pycaffe.py _Net_forward_all)."""
        batch = self.blobs[self.inputs[0]].shape[0]
        total = len(next(iter(kwargs.values())))
        outs: Dict[str, List[np.ndarray]] = {}
        for i in range(0, total, batch):
            chunk = {k: _pad_batch(v[i : i + batch], batch) for k, v in kwargs.items()}
            out = self.forward(blobs=blobs, **chunk)
            take = min(batch, total - i)
            for k, v in out.items():
                outs.setdefault(k, []).append(v[:take])
        return {k: np.concatenate(v) for k, v in outs.items()}

    @property
    def layer_dict(self):
        return OrderedDict((i.name, i) for i in self._net.impls)

    @property
    def _layer_names(self) -> List[str]:
        """pycaffe Net._layer_names parity."""
        return [i.name for i in self._net.impls]

    @property
    def layers(self) -> List["_LayerFacade"]:
        """pycaffe Net.layers parity: objects with .type and .blobs (the
        layer's parameter blobs, sharing the .params facades)."""
        return [_LayerFacade(i.type, self.params.get(i.name, []))
                for i in self._net.impls]

    @property
    def top_names(self) -> Dict[str, List[str]]:
        """pycaffe Net.top_names: {layer: [top blobs]}."""
        return OrderedDict((i.name, list(i.tops)) for i in self._net.impls)

    @property
    def bottom_names(self) -> Dict[str, List[str]]:
        """pycaffe Net.bottom_names: {layer: [bottom blobs]}."""
        return OrderedDict((i.name, list(i.bottoms)) for i in self._net.impls)


class _LayerFacade:
    """Element of Net.layers (pycaffe exposes .type and .blobs)."""

    def __init__(self, type_: str, blobs):
        self.type = type_
        self.blobs = blobs


def _pad_batch(arr, batch):
    if len(arr) == batch:
        return arr
    pad = np.repeat(arr[-1:], batch - len(arr), axis=0)
    return np.concatenate([arr, pad])


# -------------------------------------------------------------------- io


def load_image(path: str, color: bool = True) -> np.ndarray:
    """RGB float image in [0, 1] (caffe.io.load_image semantics)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR if color else cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise IOError(f"cannot load {path}")
    if color:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:
        img = img[..., None]
    return img.astype(np.float32) / 255.0


def resize_image(im: np.ndarray, new_dims, interp_order: int = 1) -> np.ndarray:
    import cv2

    interp = {0: cv2.INTER_NEAREST, 1: cv2.INTER_LINEAR, 2: cv2.INTER_CUBIC}.get(
        interp_order, cv2.INTER_LINEAR
    )
    out = cv2.resize(im, (int(new_dims[1]), int(new_dims[0])), interpolation=interp)
    if out.ndim == 2:
        out = out[..., None]
    return out


def oversample(images: Sequence[np.ndarray], crop_dims) -> np.ndarray:
    """10-crop oversampling: 4 corners + center, mirrored (caffe.io.oversample)."""
    ch, cw = int(crop_dims[0]), int(crop_dims[1])
    crops = []
    for im in images:
        h, w = im.shape[:2]
        xs = [0, w - cw, 0, w - cw, (w - cw) // 2]
        ys = [0, 0, h - ch, h - ch, (h - ch) // 2]
        for x, y in zip(xs, ys):
            c = im[y : y + ch, x : x + cw]
            crops.append(c)
            crops.append(c[:, ::-1])
    return np.stack(crops)


class Transformer:
    """caffe.io.Transformer: preprocessing configuration per input blob."""

    def __init__(self, inputs: Dict[str, Sequence[int]]):
        self.inputs = {k: tuple(v) for k, v in inputs.items()}
        self.transpose: Dict[str, tuple] = {}
        self.channel_swap: Dict[str, tuple] = {}
        self.raw_scale: Dict[str, float] = {}
        self.mean: Dict[str, np.ndarray] = {}
        self.input_scale: Dict[str, float] = {}

    def set_transpose(self, name, order):
        self.transpose[name] = tuple(order)

    def set_channel_swap(self, name, order):
        self.channel_swap[name] = tuple(order)

    def set_raw_scale(self, name, scale):
        self.raw_scale[name] = scale

    def set_mean(self, name, mean):
        self.mean[name] = np.asarray(mean, np.float32)

    def set_input_scale(self, name, scale):
        self.input_scale[name] = scale

    def preprocess(self, name, data: np.ndarray) -> np.ndarray:
        x = np.asarray(data, np.float32)
        shape = self.inputs[name]
        if x.shape[:2] != tuple(shape[2:]):
            x = resize_image(x, shape[2:])
        if name in self.transpose:
            x = x.transpose(self.transpose[name])
        if name in self.channel_swap:
            x = x[np.asarray(self.channel_swap[name])]
        if name in self.raw_scale:
            x = x * self.raw_scale[name]
        if name in self.mean:
            m = self.mean[name]
            if m.ndim == 1:
                m = m.reshape(-1, 1, 1)
            x = x - m
        if name in self.input_scale:
            x = x * self.input_scale[name]
        return x

    def deprocess(self, name, data: np.ndarray) -> np.ndarray:
        x = np.asarray(data, np.float32).copy()
        if name in self.input_scale:
            x = x / self.input_scale[name]
        if name in self.mean:
            m = self.mean[name]
            if m.ndim == 1:
                m = m.reshape(-1, 1, 1)
            x = x + m
        if name in self.raw_scale:
            x = x / self.raw_scale[name]
        if name in self.channel_swap:
            inv = np.argsort(self.channel_swap[name])
            x = x[inv]
        if name in self.transpose:
            x = x.transpose(np.argsort(self.transpose[name]))
        return x


class Classifier(Net):
    """caffe.Classifier: image -> class probabilities with crop/oversample."""

    def __init__(self, model_file, pretrained_file=None, image_dims=None,
                 mean=None, input_scale=None, raw_scale=None, channel_swap=None):
        super().__init__(model_file, pretrained_file, TEST)
        in_ = self.inputs[0]
        self.transformer = Transformer({in_: self.blobs[in_].shape})
        self.transformer.set_transpose(in_, (2, 0, 1))
        if mean is not None:
            self.transformer.set_mean(in_, mean)
        if input_scale is not None:
            self.transformer.set_input_scale(in_, input_scale)
        if raw_scale is not None:
            self.transformer.set_raw_scale(in_, raw_scale)
        if channel_swap is not None:
            self.transformer.set_channel_swap(in_, channel_swap)
        self.crop_dims = np.array(self.blobs[in_].shape[2:])
        self.image_dims = np.array(image_dims if image_dims is not None else self.crop_dims)

    def predict(self, inputs: Sequence[np.ndarray], oversample_: bool = True) -> np.ndarray:
        in_ = self.inputs[0]
        images = [resize_image(im, self.image_dims) for im in inputs]
        if oversample_:
            crops = oversample(images, self.crop_dims)
        else:
            center = (np.asarray(images[0].shape[:2]) - self.crop_dims) // 2
            crops = np.stack([
                im[center[0] : center[0] + self.crop_dims[0],
                   center[1] : center[1] + self.crop_dims[1]] for im in images
            ])
        data = np.stack([self.transformer.preprocess(in_, c) for c in crops])
        out = self.forward_all(**{in_: data})[self.outputs[0]]
        if oversample_:
            out = out.reshape(len(inputs), 10, -1).mean(1)
        return out


class Detector(Net):
    """caffe.Detector: windowed detection (detect_windows)."""

    def __init__(self, model_file, pretrained_file=None, mean=None,
                 input_scale=None, raw_scale=None, channel_swap=None, context_pad=0):
        super().__init__(model_file, pretrained_file, TEST)
        in_ = self.inputs[0]
        self.transformer = Transformer({in_: self.blobs[in_].shape})
        self.transformer.set_transpose(in_, (2, 0, 1))
        if mean is not None:
            self.transformer.set_mean(in_, mean)
        if input_scale is not None:
            self.transformer.set_input_scale(in_, input_scale)
        if raw_scale is not None:
            self.transformer.set_raw_scale(in_, raw_scale)
        if channel_swap is not None:
            self.transformer.set_channel_swap(in_, channel_swap)
        self.context_pad = context_pad

    def detect_windows(self, images_windows):
        in_ = self.inputs[0]
        dims = self.blobs[in_].shape[2:]
        window_inputs = []
        meta = []
        for path, windows in images_windows:
            image = load_image(path)
            for window in windows:
                y0, x0, y1, x1 = [int(v) for v in window]
                crop = image[y0:y1, x0:x1]
                window_inputs.append(self.transformer.preprocess(in_, resize_image(crop, dims)))
                meta.append((path, window))
        data = np.stack(window_inputs)
        out = self.forward_all(**{in_: data})[self.outputs[0]]
        return [
            {"window": w, "filename": f, "prediction": out[i]}
            for i, (f, w) in enumerate(meta)
        ]


# ---- caffe.io blobproto/datum helpers (reference python/caffe/io.py:18-107)
# operating on the framework's dict-form messages + wire codec (the
# caffe_pb2 classes work too — same wire bytes)

def blobproto_to_array(blob: dict, return_diff: bool = False) -> np.ndarray:
    data = np.array(blob.get("diff" if return_diff else "data", []),
                    dtype=np.float64)
    if any(k in blob for k in ("num", "channels", "height", "width")):
        return data.reshape(blob.get("num", 0), blob.get("channels", 0),
                            blob.get("height", 0), blob.get("width", 0))
    return data.reshape(blob["shape"]["dim"])


def array_to_blobproto(arr: np.ndarray, diff=None) -> dict:
    blob = {"shape": {"dim": list(arr.shape)},
            "data": [float(v) for v in np.ravel(arr)]}
    if diff is not None:
        blob["diff"] = [float(v) for v in np.ravel(diff)]
    return blob


def arraylist_to_blobprotovector_str(arraylist) -> bytes:
    from .proto import SCHEMA, wire

    vec = {"blobs": [array_to_blobproto(a) for a in arraylist]}
    return wire.encode(vec, SCHEMA, "BlobProtoVector")


def blobprotovector_str_to_arraylist(s: bytes):
    from .proto import SCHEMA, wire

    vec = wire.decode(s, SCHEMA, "BlobProtoVector")
    return [blobproto_to_array(b) for b in vec.get("blobs", [])]


def array_to_datum(arr: np.ndarray, label=None) -> dict:
    from .proto.datum import array_to_datum as _impl

    return _impl(arr, label)


def datum_to_array(datum: dict) -> np.ndarray:
    from .proto.datum import datum_to_array as _impl

    return _impl(datum)


def draw_net_text(net_param: dict) -> str:
    """Text rendering of the DAG (caffe.draw fallback without graphviz)."""
    lines = []
    for l in net_param.get("layer", []):
        bottoms = ", ".join(l.get("bottom", []))
        tops = ", ".join(l.get("top", []))
        lines.append(f"{l.get('name')} ({l.get('type')}): [{bottoms}] -> [{tops}]")
    return "\n".join(lines)


def draw_net_dot(net_param: dict) -> str:
    """Graphviz .dot source for the net DAG (caffe.draw.draw_net)."""
    lines = ["digraph net {", "  rankdir=LR;"]
    for l in net_param.get("layer", []):
        name = l.get("name")
        lines.append(f'  "{name}" [shape=record, label="{name}|{l.get("type")}"];')
        for b in l.get("bottom", []):
            lines.append(f'  "blob_{b}" -> "{name}";')
        for t in l.get("top", []):
            lines.append(f'  "{name}" -> "blob_{t}";')
    for l in net_param.get("layer", []):
        for t in l.get("top", []):
            lines.append(f'  "blob_{t}" [shape=oval, label="{t}"];')
    lines.append("}")
    return "\n".join(lines)


class _PySolver:
    """pycaffe/matcaffe Solver facade over the training Solver: step/solve/
    iter/snapshot/restore plus .net and .test_nets exposed as api.Net
    facades (reference matlab/+caffe/Solver.m surface)."""

    def __init__(self, solver):
        self._solver = solver
        self.net = Net(solver.net)
        self.test_nets = [Net(tn[0]) for tn in solver.test_nets]

    @property
    def iter(self) -> int:
        return self._solver.iter

    def _sync_facades(self) -> None:
        """Mark the Net facades stale so the next params read pulls the
        trained values (reference pycaffe params alias the live blobs;
        lazy re-pull keeps step() free of per-iteration device fetches).
        Output blobs of the last training forward are written through so
        the ``solver.step(1); solver.net.blobs['loss'].data`` idiom reads
        the trained-step values like reference shared memory (values ride
        the jitted step's aux channel — no extra forward; intermediate
        blobs still require a forward()).  The fetch is LAZY: step()
        plants thunks and the device_get + layout convert happens only
        when a blob is first read (one shared pull for all outputs)."""
        self.net._mark_params_stale()
        solver = self._solver
        cache: Dict[str, np.ndarray] = {}

        def make_thunk(name):
            def thunk():
                if not cache:
                    cache.update(solver.train_outputs())
                return cache[name]
            return thunk

        for name in solver.last_outputs:
            b = self.net.blobs.get(name)
            if b is not None:
                b._set_pending(make_thunk(name))
        for tn in self.test_nets:
            tn._mark_params_stale()

    def step(self, iters: int = 1):
        self.net._push_params()  # user edits of net.params write through
        r = self._solver.step(int(iters))
        self._sync_facades()
        return r

    def solve(self) -> None:
        self.net._push_params()
        self._solver.solve()
        self._sync_facades()

    def snapshot(self, prefix=None):
        self.net._push_params()  # snapshot the user-visible weights
        return self._solver.snapshot(prefix)

    def restore(self, path: str) -> None:
        self._solver.restore(path)
        self._sync_facades()


def _self_feed(net):
    """Default data_fn for nets that feed themselves (or need nothing)."""
    if net.data_layers:
        def data_fn(it):
            out = {}
            for dl in net.data_layers:
                out.update(dl.next_batch())
            return out
        return data_fn
    if not net.input_names:
        return lambda it: {}
    return None


def SGDSolver(solver_file: str, data_fn=None, test_data_fn=None):
    """pycaffe-style solver constructor; ``data_fn(it) -> {input: array}``
    feeds the graph inputs (data layers are external in this framework).
    Test nets are built from the solver param (test_net files or the shared
    net at TEST phase, per-net test_iter — Solver::Init semantics); nets
    with in-graph data layers self-feed, external ``input:`` blobs are fed
    by ``test_data_fn`` when given, else zeros (reference Solver::Test
    forwards with current blob contents, and Blob data starts zeroed)."""
    from .proto import caffe_pb, prototxt
    from .training.solver import Solver

    msg = prototxt.parse_file(solver_file, "SolverParameter")
    sp = caffe_pb.view(msg, "SolverParameter")
    net_src = sp.net if sp.has("net") else sp.train_net
    net = _CoreNet(net_src, phase=TRAIN)
    if data_fn is None:
        data_fn = _self_feed(net)
        if data_fn is None:
            def data_fn(it):
                raise RuntimeError("provide data_fn to feed the net inputs")
    test_nets = []
    if sp.has("test_interval") and int(sp.test_interval) > 0:
        iters = [int(v) for v in sp.test_iter] or [50]
        sources = list(sp.test_net) or ([net_src] if not sp.has("test_net") else [])
        for i, src in enumerate(sources):
            tnet = _CoreNet(src, phase=TEST)
            # fn=None lets in-graph data layers self-feed; external-input
            # nets take test_data_fn or run on zeros like reference blobs
            if tnet.data_layers or not tnet.input_names:
                fn = None
            elif test_data_fn is not None:
                fn = test_data_fn
            else:
                def fn(it, _n=tnet):
                    return {name: np.zeros(_n.blob_shape(name), np.float32)
                            for name in _n.input_names}
            test_nets.append((tnet, fn, iters[min(i, len(iters) - 1)]))
    return _PySolver(Solver(msg, net, data_fn, test_nets=test_nets))


AdamSolver = NesterovSolver = AdaGradSolver = RMSPropSolver = AdaDeltaSolver = SGDSolver


def get_solver(solver_file: str, data_fn=None, test_data_fn=None):
    """caffe.get_solver (solver type read from the prototxt)."""
    return SGDSolver(solver_file, data_fn, test_data_fn)
