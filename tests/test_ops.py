"""Op-level tests: Caffe-semantics convolution/pooling vs a torch-CPU oracle,
plus elementwise and loss checks.  torch is only a test oracle — the framework
itself is pure JAX."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from caffe_rtpose_tpu.ops import elementwise as ew
from caffe_rtpose_tpu.ops import losses as op_losses
from caffe_rtpose_tpu.ops import nn as op_nn

torch = pytest.importorskip("torch")


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _hwio(w_oihw):
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


@pytest.mark.parametrize("k,s,p,d", [(3, 1, 1, 1), (7, 1, 3, 1), (1, 1, 0, 1), (3, 2, 1, 1), (5, 3, 2, 2)])
def test_conv2d_vs_torch(k, s, p, d):
    rs = np.random.RandomState(0)
    x = rs.randn(2, 5, 17, 13).astype(np.float32)
    w = rs.randn(4, 5, k, k).astype(np.float32)
    b = rs.randn(4).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=s, padding=p, dilation=d,
    ).numpy()
    got = op_nn.conv2d(_nhwc(x), _hwio(w), jnp.asarray(b), stride=(s, s), pad=(p, p), dilation=(d, d))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_conv2d_groups():
    rs = np.random.RandomState(1)
    x = rs.randn(1, 6, 9, 9).astype(np.float32)
    w = rs.randn(4, 3, 3, 3).astype(np.float32)  # groups=2: Cin/g=3
    ref = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w), None, padding=1, groups=2).numpy()
    got = op_nn.conv2d(_nhwc(x), _hwio(w), None, stride=(1, 1), pad=(1, 1), groups=2)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (3, 2, 1), (3, 1, 1), (2, 2, 1)])
def test_deconv2d_vs_torch(k, s, p):
    rs = np.random.RandomState(2)
    x = rs.randn(1, 3, 8, 7).astype(np.float32)
    w = rs.randn(3, 4, k, k).astype(np.float32)  # caffe deconv layout (Cin, Cout, k, k)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), None, stride=s, padding=p
    ).numpy()
    w_int = jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]))
    got = op_nn.deconv2d(_nhwc(x), w_int, None, stride=(s, s), pad=(p, p))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k,s,p,H,W", [(2, 2, 0, 8, 8), (3, 2, 0, 7, 9), (3, 2, 1, 11, 5), (2, 2, 0, 9, 9)])
def test_max_pool_caffe_ceil_vs_torch(k, s, p, H, W):
    rs = np.random.RandomState(3)
    x = rs.randn(2, 3, H, W).astype(np.float32)
    # torch ceil_mode=True matches caffe's ceil+clip output size rule
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), k, stride=s, padding=p, ceil_mode=True
    ).numpy()
    got = op_nn.max_pool2d(_nhwc(x), (k, k), (s, s), (p, p))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("k,s,p,H,W", [(2, 2, 0, 8, 8), (3, 2, 1, 7, 9), (3, 3, 1, 10, 10)])
def test_avg_pool_caffe_vs_torch(k, s, p, H, W):
    rs = np.random.RandomState(4)
    x = rs.randn(1, 2, H, W).astype(np.float32)
    ref = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), k, stride=s, padding=p, ceil_mode=True, count_include_pad=True
    ).numpy()
    got = op_nn.avg_pool2d(_nhwc(x), (k, k), (s, s), (p, p))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == ref.shape
    # caffe divides by the window clipped to padded bounds == torch
    # count_include_pad=True with ceil windows clipped likewise
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_lrn_across_channels_vs_torch():
    rs = np.random.RandomState(5)
    x = rs.rand(2, 7, 5, 5).astype(np.float32)
    size, alpha, beta, k = 5, 1e-4, 0.75, 1.0
    ref = torch.nn.functional.local_response_norm(
        torch.from_numpy(x), size, alpha=alpha, beta=beta, k=k
    ).numpy()
    got = op_nn.lrn_across_channels(_nhwc(x), size, alpha, beta, k)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5)


def test_inner_product():
    rs = np.random.RandomState(6)
    x = rs.randn(3, 10).astype(np.float32)
    w = rs.randn(10, 4).astype(np.float32)
    b = rs.randn(4).astype(np.float32)
    got = op_nn.inner_product(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), x @ w + b, rtol=1e-5, atol=1e-5)


def test_batch_norm_inference():
    rs = np.random.RandomState(7)
    x = rs.randn(2, 3, 4, 4).astype(np.float32)
    mean = rs.randn(3).astype(np.float32) * 2
    var = rs.rand(3).astype(np.float32) * 3
    sf = np.float32(2.0)
    got = op_nn.batch_norm_inference(
        _nhwc(x), jnp.asarray(mean * sf), jnp.asarray(var * sf), jnp.asarray(sf), 1e-5, 3
    )
    ref = (x - mean[None, :, None, None]) / np.sqrt(var[None, :, None, None] + 1e-5)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4)


def test_elementwise_family():
    x = jnp.asarray(np.linspace(-3, 3, 13, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(ew.relu(x)), np.maximum(np.asarray(x), 0))
    np.testing.assert_allclose(np.asarray(ew.relu(x, 0.1)),
                               np.where(np.asarray(x) > 0, np.asarray(x), 0.1 * np.asarray(x)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ew.bnll(x)), np.log1p(np.exp(np.asarray(x))), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ew.power(x, 2.0, 3.0, 1.0)), (3 * np.asarray(x) + 1) ** 2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ew.exp(x, -1.0, 1.0, 0.0)), np.exp(np.asarray(x)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ew.exp(x, 2.0, 1.0, 0.0)), 2.0 ** np.asarray(x), rtol=1e-5)


def test_euclidean_losses():
    rs = np.random.RandomState(8)
    a = rs.randn(4, 3, 2, 2).astype(np.float32)
    b = rs.randn(4, 3, 2, 2).astype(np.float32)
    got = float(op_losses.euclidean(jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(np.sum((a - b) ** 2) / 8, rel=1e-5)

    # masked: channel 1 off for sample 0; background (last) channel always on
    mask = np.ones((4, 3), np.float32)
    mask[0, 1] = 0
    got_m = float(
        op_losses.euclidean_masked(
            _nhwc(a), _nhwc(b), jnp.asarray(mask), channel_axis=3
        )
    )
    diff = a - b
    diff[0, 1] = 0  # masked out (channel 2 is background -> stays on)
    assert got_m == pytest.approx(np.sum(diff ** 2) / 8, rel=1e-5)
    # masking the background channel has no effect
    mask2 = np.ones((4, 3), np.float32)
    mask2[2, 2] = 0
    got_bg = float(
        op_losses.euclidean_masked(_nhwc(a), _nhwc(b), jnp.asarray(mask2), channel_axis=3)
    )
    assert got_bg == pytest.approx(np.sum((a - b) ** 2) / 8, rel=1e-5)


def test_softmax_xent_vs_torch():
    rs = np.random.RandomState(9)
    logits = rs.randn(6, 5).astype(np.float32)
    labels = rs.randint(0, 5, 6)
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(op_losses.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(ref, rel=1e-5)


def test_sigmoid_xent_vs_torch():
    rs = np.random.RandomState(10)
    logits = rs.randn(4, 7).astype(np.float32)
    targets = (rs.rand(4, 7) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="sum"
    ).item() / 4
    got = float(op_losses.sigmoid_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    assert got == pytest.approx(ref, rel=1e-5)
