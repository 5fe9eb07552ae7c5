"""Weight initializers with Caffe Filler semantics (reference
include/caffe/filler.hpp).  Fillers operate on *caffe-layout* shapes (e.g.
conv OIHW); layout transposition to internal arrays happens in the layer
builders, so fan computations match the reference exactly.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..proto.caffe_pb import View


def _fans(shape: Sequence[int]):
    count = int(np.prod(shape))
    num = shape[0] if len(shape) >= 1 else 1
    channels = shape[1] if len(shape) >= 2 else 1
    fan_in = count // max(num, 1)
    fan_out = count // max(channels, 1)
    return fan_in, fan_out


def fill(key: jax.Array, shape: Sequence[int], filler: View) -> jax.Array:
    """Create a caffe-layout array according to a FillerParameter view."""
    ftype = filler.type if filler is not None else "constant"
    shape = tuple(int(d) for d in shape)
    if ftype == "constant":
        return jnp.full(shape, filler.value if filler is not None else 0.0, jnp.float32)
    if ftype == "uniform":
        return jax.random.uniform(key, shape, jnp.float32, filler.min, filler.max)
    if ftype == "gaussian":
        # sparse gaussian (filler.sparse >= 0) not supported; reference uses it
        # nowhere in shipped models
        return filler.mean + filler.std * jax.random.normal(key, shape, jnp.float32)
    if ftype == "xavier":
        fan_in, fan_out = _fans(shape)
        vn = filler.variance_norm
        n = fan_in if vn == 0 else (fan_out if vn == 1 else (fan_in + fan_out) / 2.0)
        scale = math.sqrt(3.0 / n)
        return jax.random.uniform(key, shape, jnp.float32, -scale, scale)
    if ftype == "msra":
        fan_in, fan_out = _fans(shape)
        vn = filler.variance_norm
        n = fan_in if vn == 0 else (fan_out if vn == 1 else (fan_in + fan_out) / 2.0)
        std = math.sqrt(2.0 / n)
        return std * jax.random.normal(key, shape, jnp.float32)
    if ftype == "positive_unitball":
        x = jax.random.uniform(key, shape, jnp.float32)
        flat = x.reshape(shape[0], -1)
        flat = flat / jnp.sum(flat, axis=1, keepdims=True)
        return flat.reshape(shape)
    if ftype == "bilinear":
        # upsampling kernel for deconv (filler.hpp BilinearFiller)
        if len(shape) != 4 or shape[2] != shape[3]:
            raise ValueError("bilinear filler needs square 4-D kernels")
        k = shape[3]
        f = int(math.ceil(k / 2.0))
        c = (2 * f - 1 - f % 2) / (2.0 * f)
        coords = np.arange(k)
        w1d = 1 - np.abs(coords / f - c)
        kern = np.outer(w1d, w1d).astype(np.float32)
        return jnp.broadcast_to(jnp.asarray(kern), shape)
    raise ValueError(f"unknown filler type {ftype!r}")
