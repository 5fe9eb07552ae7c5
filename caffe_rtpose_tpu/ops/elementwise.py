"""Elementwise / neuron ops matching Caffe layer semantics (reference
src/caffe/layers/*_layer.cpp neuron family).  These fuse into surrounding
matmuls under XLA; no manual kernels needed."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def relu(x, negative_slope: float = 0.0):
    if negative_slope == 0.0:
        return jnp.maximum(x, 0)
    return jnp.where(x > 0, x, x * negative_slope)


def prelu(x, slopes, channel_axis: int):
    shape = [1] * x.ndim
    if slopes.size == 1:
        slope = slopes.reshape(())
    else:
        shape[channel_axis] = x.shape[channel_axis]
        slope = slopes.reshape(shape)
    return jnp.where(x > 0, x, x * slope)


def elu(x, alpha: float):
    return jnp.where(x > 0, x, alpha * (jnp.exp(jnp.minimum(x, 0)) - 1))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def absval(x):
    return jnp.abs(x)


def bnll(x):
    """Caffe BNLL: x>0 ? x + log(1+exp(-x)) : log(1+exp(x)) (numerically safe
    softplus)."""
    return jnp.where(x > 0, x, 0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def power(x, power_: float, scale: float, shift: float):
    y = scale * x + shift
    if power_ == 1.0:
        return y
    return jnp.power(y, power_)


def exp(x, base: float, scale: float, shift: float):
    """y = base^(scale*x + shift); base -1 means e (exp_layer.cpp)."""
    inner = scale * x + shift
    if base == -1.0:
        return jnp.exp(inner)
    return jnp.exp(inner * jnp.log(base))


def log(x, base: float, scale: float, shift: float):
    inner = scale * x + shift
    y = jnp.log(inner)
    if base != -1.0:
        y = y / jnp.log(base)
    return y


def threshold(x, t: float):
    return (x > t).astype(x.dtype)


def scale_op(x, gamma, bias, axis_physical: int, num_axes: int):
    """Caffe Scale layer: multiply by a (num_axes-dim) param broadcast along
    ``axis``.  For the common 4-D channel case the physical axis is the last.
    """
    shape = [1] * x.ndim
    gshape = gamma.shape
    # place gamma dims starting at axis_physical (physical layout mapping is
    # handled by the caller for 4-D channel scales)
    for i, d in enumerate(gshape):
        shape[axis_physical + i] = d
    y = x * gamma.reshape(shape)
    if bias is not None:
        y = y + bias.reshape(shape)
    return y


def dropout(x, ratio: float, rng, training: bool):
    if not training or ratio == 0.0:
        return x
    keep = 1.0 - ratio
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0).astype(x.dtype)
