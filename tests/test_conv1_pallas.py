"""Parity of the fused Pallas conv1-block kernel (interpret mode on CPU)
against the production XLA chain (ops/nn.py convs + reduce_window pool).

Tolerance is one bf16 ulp: the kernel's tap-pair matmul accumulation order
differs from XLA's conv reduction order, so f32 partial sums of bf16
products can land one representable value apart after the bf16 cast.
"""
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import pytest


def _native(x, w1, b1, w2, b2):
    from caffe_rtpose_tpu.ops.nn import conv2d

    h = jnp.maximum(conv2d(x, w1, b1, stride=(1, 1), pad=(1, 1)), 0)
    h = jnp.maximum(conv2d(h, w2, b2, stride=(1, 1), pad=(1, 1)), 0)
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@pytest.mark.parametrize("shape", [(2, 64, 96), (1, 32, 656), (3, 48, 64)])
def test_conv1_pallas_matches_xla_chain(shape):
    from caffe_rtpose_tpu.ops.conv1_pallas import conv1_block_pallas

    B, H, W = shape
    rs = np.random.RandomState(hash(shape) % 2**31)
    x = jnp.asarray(rs.rand(B, H, W, 3).astype(np.float32) - 0.5,
                    jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rs.randn(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rs.randn(64).astype(np.float32) * 0.1)

    a = np.asarray(_native(x, w1, b1, w2, b2), np.float32)
    b = np.asarray(
        conv1_block_pallas(x, w1, b1, w2, b2, interpret=True), np.float32)
    assert a.shape == b.shape == (B, H // 2, W // 2, 64)
    # two bf16 ulps relative to each element's magnitude (+ absolute
    # floor for near-zero post-ReLU values): one ulp from the different
    # f32 accumulation order, one more when the pre-cast values straddle
    # a bf16 rounding boundary
    tol = np.maximum(np.maximum(np.abs(a), np.abs(b)) * 2 ** -7, 2 ** -13)
    assert (np.abs(a - b) <= tol).all(), float(np.abs(a - b).max())


def test_conv1_pallas_edge_rows_are_padding_not_garbage():
    """First/last tile masks: a constant image makes halo mistakes visible
    (any leaked tap changes border sums)."""
    from caffe_rtpose_tpu.ops.conv1_pallas import conv1_block_pallas

    B, H, W = 1, 32, 64
    x = jnp.full((B, H, W, 3), 0.25, jnp.bfloat16)
    rs = np.random.RandomState(3)
    w1 = jnp.asarray(rs.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    b1 = jnp.zeros(64, jnp.float32)
    w2 = jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.zeros(64, jnp.float32)
    a = np.asarray(_native(x, w1, b1, w2, b2), np.float32)
    b = np.asarray(
        conv1_block_pallas(x, w1, b1, w2, b2, interpret=True), np.float32)
    tol = np.maximum(np.maximum(np.abs(a), np.abs(b)) * 2 ** -7, 2 ** -13)
    assert (np.abs(a - b) <= tol).all(), float(np.abs(a - b).max())
