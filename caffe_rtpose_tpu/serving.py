"""AOT serving bundles: the fused estimator program exported ahead of time.

The reference's deployment artifact is a pair (deploy prototxt +
.caffemodel); every process that serves it re-builds the Net graph at
startup (warmup(), examples/rtpose/rtpose.cpp:173-237).  The TPU-native
framework adds a third, fully ahead-of-time form: the ONE fused XLA
program the estimator runs per frame (CNN -> part upsample -> NMS ->
PAF pair scoring -> byte packing) serialized as a versioned StableHLO
artifact via ``jax.export``, next to the weights and the host-side
metadata needed to drive it.

A serving process loads the bundle and runs pose estimation without the
prototxt parser, graph builder, weight codec, or Python tracing in the
loop — and the artifact is platform-pinned at export time (e.g. exported
*for* TPU from a CPU-only build box via ``platforms=["tpu"]``).

Bundle layout (a directory)::

    meta.json               host metadata (shapes, scales, descriptor, ...)
    weights.npz             name-keyed params ("<layer>::<i>" -> array)
    program.jaxexport       default per-frame program (possibly pair-capped)
    program_nocap.jaxexport overflow program at max_peaks (only when capped)

``ExportedPose`` mirrors the host-side surface of ``PoseEstimator``
(make_input / run_device / fetch / estimate), including the pair_cap
overflow refetch path, so ``pipeline.runner`` and user code can treat the
two interchangeably.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .ops import layout
from .pose.descriptor import for_num_parts
from .pose.estimator import PoseEstimator

_FORMAT_VERSION = 1
_META = "meta.json"
_WEIGHTS = "weights.npz"
_PROGRAM = "program.jaxexport"
_PROGRAM_NOCAP = "program_nocap.jaxexport"


def _device_input_spec(est: PoseEstimator) -> jax.ShapeDtypeStruct:
    """Spec of the image argument exactly as ``run_device`` hands it to the
    compiled program (physical layout for the float path; raw transfer
    buffer for the u8 paths; leading batch axis when batch > 1)."""
    shape = est.input_shape()
    if not est.input_u8:
        # run_device moves (S, 3, H, W) logical -> (S, H, W, 3) physical
        s, c, h, w = shape
        shape = (s, h, w, c)
        dtype = est.net.dtype
    else:
        dtype = jnp.uint8
    if est.batch > 1:
        shape = (est.batch,) + shape
    return jax.ShapeDtypeStruct(shape, dtype)


def _scalar_spec():
    return jax.ShapeDtypeStruct((), jnp.float32)


def _params_spec(params):
    return jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)


def export_estimator(
    est: PoseEstimator,
    out_dir: str,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize ``est``'s fused device program(s) + weights + metadata
    into ``out_dir``.  ``platforms``: target platform list for the
    artifact (default: the current JAX backend), e.g. ``["tpu"]`` or
    ``["tpu", "cpu"]``."""
    if est.keep_heatmap:
        raise ValueError("export targets the production packed program; "
                         "build the estimator with keep_heatmap=False")
    os.makedirs(out_dir, exist_ok=True)
    platforms = list(platforms) if platforms else None

    pspec = _params_spec(est.net.params)
    ispec = _device_input_spec(est)
    exp = jax_export.export(est._compiled, platforms=platforms)(
        pspec, ispec, _scalar_spec(), _scalar_spec())
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(exp.serialize())

    capped = est.eff_peaks < est.max_peaks
    if capped:
        # the overflow refetch program: single frame, full peak capacity
        nocap = est._nocap_compiled()
        ispec1 = jax.ShapeDtypeStruct(
            ispec.shape[1:] if est.batch > 1 else ispec.shape, ispec.dtype)
        exp_nc = jax_export.export(nocap, platforms=platforms)(
            pspec, ispec1, _scalar_spec(), _scalar_spec())
        with open(os.path.join(out_dir, _PROGRAM_NOCAP), "wb") as f:
            f.write(exp_nc.serialize())

    flat = {}
    for name, plist in est.net.params.items():
        for i, p in enumerate(plist):
            flat[f"{name}::{i}"] = np.asarray(p)
    np.savez(os.path.join(out_dir, _WEIGHTS), **flat)

    meta = {
        "format_version": _FORMAT_VERSION,
        "net_resolution": [est.net_w, est.net_h],
        "num_scales": est.num_scales,
        "start_scale": est.start_scale,
        "scale_gap": est.scale_gap,
        "batch": est.batch,
        "num_parts": est.num_parts,
        "max_peaks": est.max_peaks,
        "eff_peaks": est.eff_peaks,
        "packed": bool(est._packed),
        "input_u8": bool(est.input_u8),
        "pack_u8": bool(est.pack_u8),
        "device_rescale": bool(est.device_rescale),
        "dtype": np.dtype(est.net.dtype).name,
        "platforms": platforms or [jax.default_backend()],
        "descriptor": est.descriptor.name,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return out_dir


class _NetShim:
    """The two Net attributes the PoseEstimator host methods touch."""

    def __init__(self, params, dtype):
        self.params = params
        self.dtype = dtype


class ExportedPose(PoseEstimator):
    """A ``PoseEstimator`` reconstructed from an exported bundle: the same
    host-side API (make_input / run_device / fetch / estimate /
    pair_cap-overflow refetch) driving the deserialized AOT program
    instead of a freshly traced one.  No prototxt, caffemodel, or graph
    build happens at load time."""

    def __init__(self, bundle_dir: str, warm_overflow: bool = False):
        # deliberately does NOT chain to PoseEstimator.__init__ — all
        # state is restored from the bundle, no Net is built
        with open(os.path.join(bundle_dir, _META)) as f:
            meta = json.load(f)
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"bundle format {meta.get('format_version')} != "
                f"{_FORMAT_VERSION} supported by this build")
        self.bundle_dir = bundle_dir
        self.net_w, self.net_h = meta["net_resolution"]
        self.num_scales = meta["num_scales"]
        self.start_scale = meta["start_scale"]
        self.scale_gap = meta["scale_gap"]
        self.batch = meta["batch"]
        self.num_parts = meta["num_parts"]
        self.max_peaks = meta["max_peaks"]
        self.eff_peaks = meta["eff_peaks"]
        self._packed = meta["packed"]
        self.input_u8 = meta["input_u8"]
        self.pack_u8 = meta["pack_u8"]
        self.device_rescale = meta["device_rescale"]
        self.keep_heatmap = False
        self.use_pallas = False
        self._pair_cap = (self.eff_peaks
                          if self.eff_peaks < self.max_peaks else None)
        self.descriptor = for_num_parts(self.num_parts)
        assert self.descriptor.name == meta["descriptor"]
        self.params_connect = self.descriptor.defaults

        with np.load(os.path.join(bundle_dir, _WEIGHTS)) as z:
            params = {}
            for key in z.files:
                name, i = key.rsplit("::", 1)
                params.setdefault(name, {})[int(i)] = jnp.asarray(z[key])
        params = {n: [d[i] for i in sorted(d)] for n, d in params.items()}
        self.net = _NetShim(params, jnp.dtype(meta["dtype"]))

        with open(os.path.join(bundle_dir, _PROGRAM), "rb") as f:
            self._exported = jax_export.deserialize(bytearray(f.read()))
        self._compiled = jax.jit(self._exported.call)
        self._compiled_nocap = None
        nocap_path = os.path.join(bundle_dir, _PROGRAM_NOCAP)
        if os.path.exists(nocap_path):
            with open(nocap_path, "rb") as f:
                self._compiled_nocap = jax.jit(
                    jax_export.deserialize(bytearray(f.read())).call)
        if warm_overflow and self._compiled_nocap is not None:
            import threading

            threading.Thread(target=self._warm_nocap, daemon=True).start()

    # the AOT bundle cannot re-trace programs -------------------------------

    def _build_compiled(self, eff_peaks=None, batch=None):
        raise NotImplementedError(
            "ExportedPose runs fixed AOT programs; rebuild the bundle with "
            "different options via export_estimator()")

    def _nocap_compiled(self):
        if self._compiled_nocap is None:
            raise NotImplementedError(
                "bundle was exported without a pair_cap overflow program")
        return self._compiled_nocap

    @property
    def platforms(self):
        return list(self._exported.platforms)
