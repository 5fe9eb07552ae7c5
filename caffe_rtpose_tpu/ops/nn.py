"""Dense compute ops: convolution, deconvolution, pooling, LRN, inner product,
batch norm.  All operate on physical NHWC activations and HWIO kernels (MXU
native); semantics mirror the Caffe layers they stand in for (reference
src/caffe/layers/{base_conv,conv,deconv,pooling,lrn,inner_product,batch_norm}_layer.cpp).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DIMS_NHWC = ("NHWC", "HWIO", "NHWC")


def _conv_call(x, w, kwargs, accum_dtype):
    """conv_general_dilated with f32 accumulation that stays differentiable
    at reduced operand dtype.

    jax 0.9's conv transpose rule rejects the dtype mix that
    ``preferred_element_type`` creates (f32 cotangent vs bf16 operands), so
    mixed-precision TRAINING would fail on the forward conv alone.  When
    operand dtype != accum dtype, wrap in a custom_vjp whose backward casts
    the cotangent to the operand dtype and reuses JAX's own conv transposes
    at uniform dtype — the classic AMP recipe (bf16 grads; the TPU MXU
    still accumulates every conv in f32 internally regardless of the
    requested output dtype).  The uniform-dtype path (f32 training — the
    reference-parity dtype) is untouched: plain lax call, exact numerics.
    """
    if jnp.dtype(x.dtype) == jnp.dtype(accum_dtype):
        return lax.conv_general_dilated(
            x, w, preferred_element_type=accum_dtype, **kwargs)

    @jax.custom_vjp
    def f(x, w):
        return lax.conv_general_dilated(
            x, w, preferred_element_type=accum_dtype, **kwargs)

    def fwd(x, w):
        return f(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        _, vjp = jax.vjp(
            lambda xx, ww: lax.conv_general_dilated(xx, ww, **kwargs), x, w)
        return vjp(g.astype(x.dtype))

    f.defvjp(fwd, bwd)
    return f(x, w)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array],
    *,
    stride: Tuple[int, int],
    pad: Tuple[int, int],
    dilation: Tuple[int, int] = (1, 1),
    groups: int = 1,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Caffe Convolution forward. x: (N,H,W,Cin) w: (kh,kw,Cin/groups,Cout).

    Output spatial dim = floor((in + 2p - dilated_k)/stride) + 1, matching
    reference base_conv_layer.cpp compute_output_shape.
    """
    y = _conv_call(
        x,
        w.astype(x.dtype),
        dict(
            window_strides=stride,
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            rhs_dilation=dilation,
            dimension_numbers=DIMS_NHWC,
            feature_group_count=groups,
        ),
        accum_dtype,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def deconv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array],
    *,
    stride: Tuple[int, int],
    pad: Tuple[int, int],
    dilation: Tuple[int, int] = (1, 1),
    groups: int = 1,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Caffe Deconvolution forward (transposed conv).

    Output dim = stride*(in-1) + dilated_k - 2*pad (reference
    deconv_layer.cpp).  Implemented as an input-dilated convolution with the
    spatially-flipped kernel; ``w`` here is already the *equivalent direct
    conv* kernel in HWIO (the core.layers builder does the flip/transpose from
    the caffe blob).
    """
    kh = (w.shape[0] - 1) * dilation[0] + 1
    kw = (w.shape[1] - 1) * dilation[1] + 1
    y = _conv_call(
        x,
        w.astype(x.dtype),
        dict(
            window_strides=(1, 1),
            padding=[(kh - 1 - pad[0], kh - 1 - pad[0]),
                     (kw - 1 - pad[1], kw - 1 - pad[1])],
            lhs_dilation=stride,
            rhs_dilation=dilation,
            dimension_numbers=DIMS_NHWC,
            feature_group_count=groups,
        ),
        accum_dtype,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def pooled_size(in_size: int, k: int, s: int, p: int) -> int:
    """Caffe pooling output size: ceil mode with clip (pooling_layer.cpp)."""
    out = int(math.ceil((in_size + 2 * p - k) / float(s))) + 1
    if p > 0 and (out - 1) * s >= in_size + p:
        out -= 1
    return out


def max_pool2d(x: jax.Array, k: Tuple[int, int], s: Tuple[int, int], p: Tuple[int, int]) -> jax.Array:
    n, h, w, c = x.shape
    oh = pooled_size(h, k[0], s[0], p[0])
    ow = pooled_size(w, k[1], s[1], p[1])
    pad_h = (p[0], max(0, (oh - 1) * s[0] + k[0] - h - p[0]))
    pad_w = (p[1], max(0, (ow - 1) * s[1] + k[1] - w - p[1]))
    # -inf init keeps XLA's select-and-scatter gradient rule applicable
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    y = lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )
    return y[:, :oh, :ow, :]


def stochastic_pool2d(x: jax.Array, k: Tuple[int, int], s: Tuple[int, int],
                      rng: jax.Array, training: bool) -> jax.Array:
    """Caffe STOCHASTIC pooling (reference pooling_layer.cu:83-155), NHWC.

    Train: one uniform draw r per output; threshold = r * window-sum; the
    output is the first window element (row-major scan, clipped to the input
    like hend=min(hstart+k,h)) whose running cumsum reaches the threshold
    (StoPoolForwardTrain :83-119).  Expressed as a differentiable gather so
    autodiff routes the gradient to the sampled element exactly like
    StoPoolBackward.  Test: value-weighted average sum(x^2)/(FLT_MIN+sum(x))
    (StoPoolForwardTest :122-155).  Padding is not supported for stochastic
    pooling (reference pooling_layer.cpp:36-41 CHECK).

    Degenerate all-below-threshold windows (possible only with negative
    inputs, UB in the reference which leaves the output unwritten) resolve
    to the first element here.
    """
    n, h, w, c = x.shape
    oh = pooled_size(h, k[0], s[0], 0)
    ow = pooled_size(w, k[1], s[1], 0)
    need_h = (oh - 1) * s[0] + k[0]
    need_w = (ow - 1) * s[1] + k[1]
    # zero-pad bottom/right: padded elements add nothing to the cumsum so
    # they can never be the *first* index to reach the threshold (the
    # reference skips them outright — same selection)
    xp = jnp.pad(x, ((0, 0), (0, need_h - h), (0, need_w - w), (0, 0)))
    pats = jnp.stack(
        [xp[:, dh : dh + (oh - 1) * s[0] + 1 : s[0],
            dw : dw + (ow - 1) * s[1] + 1 : s[1], :]
         for dh in range(k[0]) for dw in range(k[1])],
        axis=3)  # (n, oh, ow, kh*kw, c) in the kernel's row-major scan order
    if training:
        cum = jnp.cumsum(pats.astype(jnp.float32), axis=3)
        total = cum[:, :, :, -1:, :]
        r = jax.random.uniform(rng, (n, oh, ow, 1, c), dtype=jnp.float32)
        idx = jnp.argmax(cum >= r * total, axis=3)
        out = jnp.take_along_axis(pats, idx[:, :, :, None, :], axis=3)
        return out[:, :, :, 0, :]
    pf = pats.astype(jnp.float32)
    ssum = pf.sum(axis=3)
    ssq = (pf * pf).sum(axis=3)
    flt_min = np.finfo(np.float32).tiny  # FLT_MIN (:144)
    return (ssq / (flt_min + ssum)).astype(x.dtype)


def avg_pool2d(x: jax.Array, k: Tuple[int, int], s: Tuple[int, int], p: Tuple[int, int]) -> jax.Array:
    """Caffe AVE pooling: divisor is the window size clipped to the *padded*
    bounds (so border windows divide by fewer than k*k only past the pad)."""
    n, h, w, c = x.shape
    oh = pooled_size(h, k[0], s[0], p[0])
    ow = pooled_size(w, k[1], s[1], p[1])
    pad_h = (p[0], max(0, (oh - 1) * s[0] + k[0] - h - p[0]))
    pad_w = (p[1], max(0, (ow - 1) * s[1] + k[1] - w - p[1]))
    y = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )[:, :oh, :ow, :]

    def axis_counts(size, kk, ss, pp, out):
        counts = np.empty(out, np.float32)
        for i in range(out):
            start = i * ss - pp
            end = min(start + kk, size + pp)
            counts[i] = end - start
        return counts

    ch = axis_counts(h, k[0], s[0], p[0], oh)
    cw = axis_counts(w, k[1], s[1], p[1], ow)
    div = jnp.asarray(np.outer(ch, cw), dtype=jnp.float32)[None, :, :, None]
    return (y / div).astype(x.dtype)


def inner_product(x2d: jax.Array, w: jax.Array, b: Optional[jax.Array], accum_dtype=jnp.float32) -> jax.Array:
    """x2d: (M, K); w: (K, N) (already transposed from caffe (N, K))."""
    y = jnp.dot(x2d, w.astype(x2d.dtype), preferred_element_type=accum_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x2d.dtype)


def lrn_across_channels(x: jax.Array, local_size: int, alpha: float, beta: float, k: float) -> jax.Array:
    """LRN ACROSS_CHANNELS on NHWC: scale = k + (alpha/n)*sum(x^2) over a
    channel window of local_size centered at each channel."""
    half = (local_size - 1) // 2
    sq = (x * x).astype(jnp.float32)
    ssum = lax.reduce_window(
        sq,
        0.0,
        lax.add,
        window_dimensions=(1, 1, 1, local_size),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (0, 0), (half, local_size - 1 - half)),
    )
    scale = k + (alpha / local_size) * ssum
    return (x * jnp.power(scale, -beta).astype(x.dtype))


def lrn_within_channel(x: jax.Array, local_size: int, alpha: float, beta: float, k: float) -> jax.Array:
    half = (local_size - 1) // 2
    sq = (x * x).astype(jnp.float32)
    ssum = lax.reduce_window(
        sq,
        0.0,
        lax.add,
        window_dimensions=(1, local_size, local_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (half, local_size - 1 - half), (half, local_size - 1 - half), (0, 0)),
    )
    scale = k + (alpha / (local_size * local_size)) * ssum
    return x * jnp.power(scale, -beta).astype(x.dtype)


def batch_norm_inference(
    x: jax.Array, mean: jax.Array, var: jax.Array, scale_factor: jax.Array, eps: float, channel_axis: int
) -> jax.Array:
    """Caffe BatchNorm (TEST / use_global_stats): stats blobs are *unscaled*
    accumulators; divide by scale_factor first (batch_norm_layer.cpp)."""
    sf = jnp.where(scale_factor == 0, 1.0, scale_factor)
    m = (mean / sf).astype(jnp.float32)
    v = (var / sf).astype(jnp.float32)
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    m = m.reshape(shape)
    v = v.reshape(shape)
    return ((x.astype(jnp.float32) - m) * lax.rsqrt(v + eps)).astype(x.dtype)


def batch_norm_training(x: jax.Array, eps: float, channel_axis: int):
    """Returns (normalized x, batch_mean, batch_var) — EMA update is handled
    by the training loop (mirrors Caffe's in-layer accumulation)."""
    axes = tuple(i for i in range(x.ndim) if i != channel_axis)
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=axes)
    # Caffe uses the biased (1/N) variance of the centered activations
    v = jnp.mean(jnp.square(xf - m.reshape([1 if i != channel_axis else -1 for i in range(x.ndim)])), axis=axes)
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    y = (xf - m.reshape(shape)) * lax.rsqrt(v.reshape(shape) + eps)
    return y.astype(x.dtype), m, v


def mvn(x: jax.Array, normalize_variance: bool, across_channels: bool, eps: float, ndim_caffe: int) -> jax.Array:
    """Caffe MVN: normalize over (C,)H,W per sample (mvn_layer.cpp).
    ``x`` is caffe NCHW layout: per-channel stats reduce over H,W."""
    if x.ndim == 4:
        axes = (1, 2, 3) if across_channels else (2, 3)
    else:
        axes = tuple(range(1, x.ndim))
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=axes, keepdims=True)
    y = xf - m
    if normalize_variance:
        # Caffe: std computed as E[x^2]-E[x]^2 then /(std+eps)
        var = jnp.mean(jnp.square(xf), axis=axes, keepdims=True) - jnp.square(m)
        y = y / (jnp.sqrt(var) + eps)
    return y.astype(x.dtype)
