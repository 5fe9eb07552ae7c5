"""Extra layer types (recurrent family, SPP, Im2col, BatchReindex, Parameter,
DummyData, InfogainLoss, HDF5Output) + gradient checks as the universal layer
oracle (the reference GradientChecker pattern,
include/caffe/test/test_gradient_check_util.hpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from caffe_rtpose_tpu.core.net import Net


def test_batch_reindex():
    text = """
    input: "x" input_shape { dim: 4 dim: 3 }
    input: "idx" input_shape { dim: 6 }
    layer { name: "r" type: "BatchReindex" bottom: "x" bottom: "idx" top: "y" }
    """
    net = Net(text)
    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    idx = np.array([0, 2, 2, 1, 3, 0], np.float32)
    out = net.forward(x=x, idx=idx)
    np.testing.assert_array_equal(out["y"], x[idx.astype(int)])


def test_parameter_layer():
    text = """
    input: "x" input_shape { dim: 2 dim: 3 }
    layer { name: "p" type: "Parameter" top: "w"
            parameter_param { shape { dim: 2 dim: 3 } } }
    layer { name: "add" type: "Eltwise" bottom: "x" bottom: "w" top: "y" }
    """
    net = Net(text)
    w = np.random.RandomState(0).randn(2, 3).astype(np.float32)
    net.load_weights({"p": [w]})
    x = np.ones((2, 3), np.float32)
    np.testing.assert_allclose(net.forward(x=x)["y"], x + w, rtol=1e-6)


def test_dummy_data():
    text = """
    layer { name: "d" type: "DummyData" top: "a" top: "b"
            dummy_data_param {
              shape { dim: 2 dim: 3 } shape { dim: 4 }
              data_filler { type: "constant" value: 2.5 }
              data_filler { type: "gaussian" std: 1.0 } } }
    """
    net = Net(text)
    out = net.forward({})
    np.testing.assert_allclose(out["a"], np.full((2, 3), 2.5))
    assert out["b"].shape == (4,)


def test_im2col_matches_patches():
    text = """
    input: "x" input_dim: 1 input_dim: 2 input_dim: 5 input_dim: 5
    layer { name: "i" type: "Im2col" bottom: "x" top: "y"
            convolution_param { kernel_size: 3 stride: 1 pad: 0 } }
    """
    net = Net(text)
    x = np.random.RandomState(0).randn(1, 2, 5, 5).astype(np.float32)
    out = net.forward(x=x)["y"]
    assert out.shape == (1, 18, 3, 3)
    # cross-check one patch against manual im2col (caffe channel order:
    # channel-major then kernel offsets)
    np.testing.assert_allclose(out[0, :, 0, 0].reshape(2, 3, 3), x[0, :, 0:3, 0:3], rtol=1e-6)


def test_spp_output_dim():
    text = """
    input: "x" input_dim: 2 input_dim: 3 input_dim: 8 input_dim: 8
    layer { name: "s" type: "SPP" bottom: "x" top: "y"
            spp_param { pyramid_height: 3 } }
    """
    net = Net(text)
    x = np.random.RandomState(1).randn(2, 3, 8, 8).astype(np.float32)
    out = net.forward(x=x)["y"]
    # 3 * (1 + 4 + 16) = 63
    assert out.shape == (2, 63)
    # level 0 is global max pool
    np.testing.assert_allclose(out[:, :3], x.max(axis=(2, 3)), rtol=1e-6)


def test_lstm_forward_semantics():
    T, N, D, H = 4, 2, 3, 5
    text = f"""
    input: "x" input_shape {{ dim: {T} dim: {N} dim: {D} }}
    input: "cont" input_shape {{ dim: {T} dim: {N} }}
    layer {{ name: "lstm" type: "LSTM" bottom: "x" bottom: "cont" top: "h"
            recurrent_param {{ num_output: {H}
              weight_filler {{ type: "uniform" min: -0.1 max: 0.1 }} }} }}
    """
    net = Net(text)
    rs = np.random.RandomState(0)
    x = rs.randn(T, N, D).astype(np.float32)
    cont = np.ones((T, N), np.float32)
    cont[0] = 0  # sequence start
    out = net.forward(x=x, cont=cont)["h"]
    assert out.shape == (T, N, H)
    # manual recurrence with the same params
    W_xc, b_c, W_hc = [np.asarray(p) for p in net.params["lstm"]]
    h = np.zeros((N, H), np.float32)
    c = np.zeros((N, H), np.float32)
    sig = lambda v: 1 / (1 + np.exp(-v))
    for t in range(T):
        hc = h * cont[t][:, None]
        cc = c * cont[t][:, None]
        gates = x[t] @ W_xc.T + b_c + hc @ W_hc.T
        i, f, o, g = (gates[:, :H], gates[:, H:2*H], gates[:, 2*H:3*H], gates[:, 3*H:])
        c = sig(f) * cc + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
        np.testing.assert_allclose(out[t], h, rtol=1e-4, atol=1e-5)
    # cont=0 mid-sequence resets state: step t=2 computes from zero state
    cont2 = np.ones((T, N), np.float32)
    cont2[2] = 0
    out2 = net.forward(x=x, cont=cont2)["h"]
    gates = x[2] @ W_xc.T + b_c  # zero h/c carried in
    i, f, o, g = (gates[:, :H], gates[:, H:2*H], gates[:, 2*H:3*H], gates[:, 3*H:])
    c_fresh = sig(i) * np.tanh(g)
    h_fresh = sig(o) * np.tanh(c_fresh)
    np.testing.assert_allclose(out2[2], h_fresh, rtol=1e-4, atol=1e-5)


def test_rnn_forward_semantics():
    T, N, D, H = 3, 2, 4, 3
    text = f"""
    input: "x" input_shape {{ dim: {T} dim: {N} dim: {D} }}
    input: "cont" input_shape {{ dim: {T} dim: {N} }}
    layer {{ name: "rnn" type: "RNN" bottom: "x" bottom: "cont" top: "o"
            recurrent_param {{ num_output: {H}
              weight_filler {{ type: "uniform" min: -0.3 max: 0.3 }} }} }}
    """
    net = Net(text)
    rs = np.random.RandomState(1)
    x = rs.randn(T, N, D).astype(np.float32)
    cont = np.ones((T, N), np.float32)
    cont[0] = 0
    out = net.forward(x=x, cont=cont)["o"]
    W_xh, b_h, W_hh, W_ho, b_o = [np.asarray(p) for p in net.params["rnn"]]
    h = np.zeros((N, H), np.float32)
    for t in range(T):
        h = np.tanh(x[t] @ W_xh.T + b_h + (h * cont[t][:, None]) @ W_hh.T)
        o = np.tanh(h @ W_ho.T + b_o)
        np.testing.assert_allclose(out[t], o, rtol=1e-4, atol=1e-5)


def test_hdf5_output_layer(tmp_path):
    import h5py

    p = str(tmp_path / "out.h5")
    text = f"""
    input: "x" input_shape {{ dim: 2 dim: 3 }}
    layer {{ name: "scale" type: "Power" bottom: "x" top: "y" power_param {{ scale: 2.0 }} }}
    layer {{ name: "save" type: "HDF5Output" bottom: "y" bottom: "x"
            hdf5_output_param {{ file_name: "{p}" }} }}
    """
    net = Net(text)
    x1 = np.ones((2, 3), np.float32)
    net.forward(x=x1)
    net.forward(x=2 * x1)
    with h5py.File(p) as f:
        assert f["y"].shape == (4, 3)
        np.testing.assert_allclose(f["y"][:2], 2.0)
        np.testing.assert_allclose(f["y"][2:], 4.0)
        np.testing.assert_allclose(f["x"][2:], 2.0)


def test_infogain_loss():
    text = """
    input: "p" input_shape { dim: 3 dim: 2 }
    input: "l" input_shape { dim: 3 }
    input: "H" input_shape { dim: 2 dim: 2 }
    layer { name: "ig" type: "InfogainLoss" bottom: "p" bottom: "l" bottom: "H" top: "loss" }
    """
    net = Net(text)
    probs = np.array([[0.7, 0.3], [0.2, 0.8], [0.5, 0.5]], np.float32)
    labels = np.array([0, 1, 0], np.float32)
    H = np.eye(2, dtype=np.float32)
    out = net.forward(p=probs, l=labels, H=H)["loss"]
    expect = -(np.log(0.7) + np.log(0.8) + np.log(0.5)) / 3
    assert out == pytest.approx(expect, rel=1e-5)


# ---------------------------------------------------------- gradient checks


@pytest.mark.parametrize("kind", ["conv", "pool_max", "pool_ave", "lrn", "ip", "lstm"])
def test_gradient_check(kind):
    """Centered finite differences vs autodiff (the reference's
    GradientChecker oracle) on small layer instances."""
    from caffe_rtpose_tpu.ops import elementwise as ew
    from caffe_rtpose_tpu.ops import nn as op_nn

    rs = np.random.RandomState(0)
    if kind == "conv":
        x = jnp.asarray(rs.randn(1, 5, 5, 2).astype(np.float32))
        w = jnp.asarray(rs.randn(3, 3, 2, 3).astype(np.float32))
        fn = lambda x, w: jnp.sum(op_nn.conv2d(x, w, None, stride=(1, 1), pad=(1, 1)) ** 2)
        check_grads(fn, (x, w), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    elif kind == "pool_max":
        x = jnp.asarray(rs.randn(1, 6, 6, 2).astype(np.float32))
        fn = lambda x: jnp.sum(op_nn.max_pool2d(x, (2, 2), (2, 2), (0, 0)) ** 2)
        check_grads(fn, (x,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    elif kind == "pool_ave":
        x = jnp.asarray(rs.randn(1, 6, 6, 2).astype(np.float32))
        fn = lambda x: jnp.sum(op_nn.avg_pool2d(x, (3, 3), (2, 2), (1, 1)) ** 2)
        check_grads(fn, (x,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    elif kind == "lrn":
        x = jnp.asarray(rs.rand(1, 4, 4, 6).astype(np.float32) + 0.5)
        fn = lambda x: jnp.sum(op_nn.lrn_across_channels(x, 5, 1e-2, 0.75, 1.0) ** 2)
        check_grads(fn, (x,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    elif kind == "ip":
        x = jnp.asarray(rs.randn(3, 4).astype(np.float32))
        w = jnp.asarray(rs.randn(4, 2).astype(np.float32))
        b = jnp.asarray(rs.randn(2).astype(np.float32))
        fn = lambda x, w, b: jnp.sum(op_nn.inner_product(x, w, b) ** 2)
        check_grads(fn, (x, w, b), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    elif kind == "lstm":
        net = Net("""
        input: "x" input_shape { dim: 3 dim: 2 dim: 3 }
        input: "cont" input_shape { dim: 3 dim: 2 }
        layer { name: "lstm" type: "LSTM" bottom: "x" bottom: "cont" top: "h"
                recurrent_param { num_output: 4
                  weight_filler { type: "uniform" min: -0.2 max: 0.2 } } }
        """)
        impl = net.layer_by_name["lstm"]
        x = jnp.asarray(rs.randn(3, 2, 3).astype(np.float32))
        cont = jnp.asarray(np.ones((3, 2), np.float32))

        def fn(params, x):
            (h,) = impl.apply(params, [x, cont], jax.random.PRNGKey(0), True, None)
            return jnp.sum(h ** 2)

        check_grads(fn, (net.params["lstm"], x), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
