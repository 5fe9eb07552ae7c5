"""Cross-IMPLEMENTATION gradient parity: the reference Caffe CPU build runs
net.Backward() on small training nets (same prototxt, same .caffemodel
weights, same inputs) and its param/input gradients must match jax.grad of
our jitted loss — validating backward semantics (loss-weight scaling, loss
normalization modes, conv/pool/BN/eltwise backward rules) against the
reference's own C++ code, not a numpy re-derivation.

Forward-side counterpart: tests/test_ref_layer_zoo.py / test_ref_parity.py.
"""

import os
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/ref_oracle_build"
ORACLE = os.path.join(BUILD, "ref_oracle")
HERE = os.path.dirname(__file__)
BUILD_SH = os.path.join(HERE, "..", "native", "ref_oracle", "build.sh")

RS = np.random.RandomState(99)


@pytest.fixture(scope="session")
def oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    r = subprocess.run(["bash", BUILD_SH, BUILD], capture_output=True,
                       text=True)
    if r.returncode != 0 or not os.path.exists(ORACLE):
        pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return ORACLE


def run_grad_case(oracle_bin, tmp, tag, proto_text, inputs, grad_blobs=(),
                  pgrad_layers=(), rtol=1e-4, atol=1e-6):
    import jax
    import jax.numpy as jnp

    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.ops import layout

    proto = os.path.join(tmp, f"{tag}.prototxt")
    open(proto, "w").write(proto_text)
    net = Net(proto, phase="TRAIN")

    rs = np.random.RandomState(5)
    for name in sorted(net.params):
        net.params[name] = [
            jnp.asarray((rs.randn(*np.asarray(p).shape) * 0.4)
                        .astype(np.float32))
            for p in net.params[name]
        ]
    weights = "-"
    if net.params:
        weights = os.path.join(tmp, f"{tag}.caffemodel")
        net.save_caffemodel(weights)

    # ---- our gradients: jax.grad of the total weighted loss
    loss_fn = net.make_loss_fn()
    phys = {}
    for k, v in inputs:
        a = jnp.asarray(v)
        info = net.blob_infos.get(k)
        if info is not None and info.nhwc and a.ndim == 4:
            a = layout.to_physical(a)
        phys[k] = a
    gp, gx = jax.grad(loss_fn, argnums=(0, 1))(
        net.params, phys, jax.random.PRNGKey(0))

    # ---- reference gradients
    raw = os.path.join(tmp, f"{tag}.raw")
    with open(raw, "wb") as f:
        for _, v in inputs:
            f.write(np.ascontiguousarray(v, np.float32).tobytes())
    names = [f"grad:{b}" for b in grad_blobs] + \
            [f"pgrad:{l}" for l in pgrad_layers]
    prefix = os.path.join(tmp, f"{tag}.out")
    r = subprocess.run([oracle_bin, "--train", proto, weights, raw, prefix] +
                       names, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"{tag}: {r.stderr[-800:]}"

    impls = {i.name: i for i in net.impls}
    feed = dict(inputs)
    for b in grad_blobs:
        want = np.fromfile(f"{prefix}.grad_{b}.raw", np.float32)
        got = np.asarray(gx[b], np.float32)
        info = net.blob_infos.get(b)
        if info is not None and info.nhwc and got.ndim == 4:
            got = np.asarray(layout.to_caffe(got))
        want = want.reshape(got.shape)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=f"{tag} grad:{b}")
        assert np.abs(want).max() > 0, f"{tag} grad:{b} trivially zero"
        del feed
        feed = dict(inputs)
    for l in pgrad_layers:
        want = np.fromfile(f"{prefix}.pgrad_{l}.raw", np.float32)
        pieces = [np.asarray(pi.export_caffe(np.asarray(g)), np.float32)
                  for pi, g in zip(impls[l].params, gp[l])]
        got = np.concatenate([p.ravel() for p in pieces])
        assert got.size == want.size, f"{tag} pgrad:{l} size mismatch"
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=f"{tag} pgrad:{l}")
        assert np.abs(want).max() > 0, f"{tag} pgrad:{l} trivially zero"


X = RS.randn(2, 3, 8, 8).astype(np.float32)


def test_conv_pool_fc_euclidean_grads(oracle, tmp_path):
    t = RS.randn(2, 5).astype(np.float32)
    proto = """
name: "g1"
force_backward: true
input: "x"  input_shape { dim: 2 dim: 3 dim: 8 dim: 8 }
input: "t"  input_shape { dim: 2 dim: 5 }
layer { name: "conv" type: "Convolution" bottom: "x" top: "c"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 } }
layer { name: "relu" type: "ReLU" bottom: "c" top: "c" }
layer { name: "pool" type: "Pooling" bottom: "c" top: "p"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "fc" type: "InnerProduct" bottom: "p" top: "f"
  inner_product_param { num_output: 5 } }
layer { name: "loss" type: "EuclideanLoss" bottom: "f" bottom: "t"
  top: "loss" }
"""
    run_grad_case(oracle, str(tmp_path), "g1", proto,
                  [("x", X), ("t", t)],
                  grad_blobs=["x"], pgrad_layers=["conv", "fc"])


def test_softmax_loss_grads_valid_normalization(oracle, tmp_path):
    x = RS.randn(6, 5).astype(np.float32)
    lbl = np.array([0, 3, 2, 4, 1, 2], np.float32)
    proto = """
name: "g2"
force_backward: true
input: "x"  input_shape { dim: 6 dim: 5 }
input: "lbl"  input_shape { dim: 6 }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "x" bottom: "lbl"
  top: "loss" }
"""
    run_grad_case(oracle, str(tmp_path), "g2", proto,
                  [("x", x), ("lbl", lbl)], grad_blobs=["x"])


def test_softmax_loss_ignore_label_grads(oracle, tmp_path):
    x = RS.randn(6, 5).astype(np.float32)
    lbl = np.array([0, 3, 1, 4, 1, 2], np.float32)
    proto = """
name: "g2i"
force_backward: true
input: "x"  input_shape { dim: 6 dim: 5 }
input: "lbl"  input_shape { dim: 6 }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "x" bottom: "lbl"
  top: "loss" loss_param { ignore_label: 1 } }
"""
    run_grad_case(oracle, str(tmp_path), "g2i", proto,
                  [("x", x), ("lbl", lbl)], grad_blobs=["x"])


def test_euclideanmask_loss_grads(oracle, tmp_path):
    """The CPM training loss (euclideanmask_loss_layer.cpp): per-(n,c) mask
    gates channels; background channel always on."""
    pred = RS.randn(2, 4, 3, 3).astype(np.float32)
    tgt = RS.randn(2, 4, 3, 3).astype(np.float32)
    mask = np.array([[1, 0, 1, 0], [0, 1, 0, 1]], np.float32)
    proto = """
name: "g3"
force_backward: true
input: "p"  input_shape { dim: 2 dim: 4 dim: 3 dim: 3 }
input: "t"  input_shape { dim: 2 dim: 4 dim: 3 dim: 3 }
input: "m"  input_shape { dim: 2 dim: 4 }
layer { name: "loss" type: "EuclideanmaskLoss" bottom: "p" bottom: "t"
  bottom: "m" top: "loss" }
"""
    run_grad_case(oracle, str(tmp_path), "g3", proto,
                  [("p", pred), ("t", tgt), ("m", mask)],
                  grad_blobs=["p"])


def test_batchnorm_train_backward_grads(oracle, tmp_path):
    t = RS.randn(2, 3, 8, 8).astype(np.float32)
    proto = """
name: "g4"
force_backward: true
input: "x"  input_shape { dim: 2 dim: 3 dim: 8 dim: 8 }
input: "t"  input_shape { dim: 2 dim: 3 dim: 8 dim: 8 }
layer { name: "bn" type: "BatchNorm" bottom: "x" top: "y" }
layer { name: "sc" type: "Scale" bottom: "y" top: "s"
  scale_param { bias_term: true } }
layer { name: "loss" type: "EuclideanLoss" bottom: "s" bottom: "t"
  top: "loss" }
"""
    run_grad_case(oracle, str(tmp_path), "g4", proto,
                  [("x", X), ("t", t)],
                  grad_blobs=["x"], pgrad_layers=["sc"], rtol=3e-4,
                  atol=1e-5)


def test_sigmoid_cross_entropy_grads(oracle, tmp_path):
    x = RS.randn(4, 6).astype(np.float32)
    t = RS.rand(4, 6).astype(np.float32)
    proto = """
name: "g5"
force_backward: true
input: "x"  input_shape { dim: 4 dim: 6 }
input: "t"  input_shape { dim: 4 dim: 6 }
layer { name: "loss" type: "SigmoidCrossEntropyLoss" bottom: "x"
  bottom: "t" top: "loss" }
"""
    run_grad_case(oracle, str(tmp_path), "g5", proto,
                  [("x", x), ("t", t)], grad_blobs=["x"])


def test_loss_weight_scaling_and_eltwise_grads(oracle, tmp_path):
    a = RS.randn(3, 4).astype(np.float32)
    b = RS.randn(3, 4).astype(np.float32)
    t = RS.randn(3, 4).astype(np.float32)
    proto = """
name: "g6"
force_backward: true
input: "a"  input_shape { dim: 3 dim: 4 }
input: "b"  input_shape { dim: 3 dim: 4 }
input: "t"  input_shape { dim: 3 dim: 4 }
layer { name: "e" type: "Eltwise" bottom: "a" bottom: "b" top: "y"
  eltwise_param { operation: SUM coeff: 2.0 coeff: -0.5 } }
layer { name: "l1" type: "EuclideanLoss" bottom: "y" bottom: "t"
  top: "l1" loss_weight: 0.7 }
layer { name: "l2" type: "EuclideanLoss" bottom: "a" bottom: "t"
  top: "l2" loss_weight: 1.3 }
"""
    run_grad_case(oracle, str(tmp_path), "g6", proto,
                  [("a", a), ("b", b), ("t", t)], grad_blobs=["a", "b"])


def test_contrastive_loss_grads(oracle, tmp_path):
    a = RS.randn(5, 4).astype(np.float32)
    b = RS.randn(5, 4).astype(np.float32)
    y = np.array([1, 0, 1, 0, 1], np.float32)
    proto = """
name: "g7"
force_backward: true
input: "a"  input_shape { dim: 5 dim: 4 }
input: "b"  input_shape { dim: 5 dim: 4 }
input: "y"  input_shape { dim: 5 dim: 1 }
layer { name: "loss" type: "ContrastiveLoss" bottom: "a" bottom: "b"
  bottom: "y" top: "loss" contrastive_loss_param { margin: 2.0 } }
"""
    run_grad_case(oracle, str(tmp_path), "g7", proto,
                  [("a", a), ("b", b), ("y", y.reshape(5, 1))],
                  grad_blobs=["a", "b"])


def test_multinomial_logistic_loss_grads(oracle, tmp_path):
    p = RS.rand(4, 5).astype(np.float32) + 0.05
    p /= p.sum(1, keepdims=True)
    lbl = np.array([0, 2, 4, 1], np.float32)
    proto = """
name: "g8"
force_backward: true
input: "p"  input_shape { dim: 4 dim: 5 }
input: "lbl"  input_shape { dim: 4 }
layer { name: "loss" type: "MultinomialLogisticLoss" bottom: "p"
  bottom: "lbl" top: "loss" }
"""
    run_grad_case(oracle, str(tmp_path), "g8", proto,
                  [("p", p), ("lbl", lbl)], grad_blobs=["p"])


def test_infogain_loss_grads(oracle, tmp_path):
    """H via infogain_param.source (the H-as-bottom form cannot coexist
    with force_backward in the reference: InfogainLossLayer does not
    override AllowForceBackward for the H bottom and FATALs)."""
    from caffe_rtpose_tpu.proto import caffe_pb
    from caffe_rtpose_tpu.proto.wire import encode

    p = RS.rand(4, 3).astype(np.float32) + 0.05
    p /= p.sum(1, keepdims=True)
    lbl = np.array([0, 2, 1, 0], np.float32)
    H = (np.eye(3) * 0.8 + 0.1).astype(np.float32)
    h_path = tmp_path / "H.binaryproto"
    h_path.write_bytes(encode(
        {"num": 1, "channels": 1, "height": 3, "width": 3,
         "data": [float(v) for v in H.flat]}, caffe_pb.SCHEMA, "BlobProto"))
    proto = f"""
name: "g9"
force_backward: true
input: "p"  input_shape {{ dim: 4 dim: 3 }}
input: "lbl"  input_shape {{ dim: 4 }}
layer {{ name: "loss" type: "InfogainLoss" bottom: "p" bottom: "lbl"
  top: "loss" infogain_loss_param {{ source: "{h_path}" }} }}
"""
    run_grad_case(oracle, str(tmp_path), "g9", proto,
                  [("p", p), ("lbl", lbl)], grad_blobs=["p"])


@pytest.mark.parametrize("norm", ["L1", "L2"])
def test_hinge_loss_grads(oracle, tmp_path, norm):
    x = RS.randn(5, 4).astype(np.float32)
    lbl = np.array([0, 3, 2, 1, 0], np.float32)
    proto = f"""
name: "g10"
force_backward: true
input: "x"  input_shape {{ dim: 5 dim: 4 }}
input: "lbl"  input_shape {{ dim: 5 }}
layer {{ name: "loss" type: "HingeLoss" bottom: "x" bottom: "lbl"
  top: "loss" hinge_loss_param {{ norm: {norm} }} }}
"""
    run_grad_case(oracle, str(tmp_path), f"g10{norm}", proto,
                  [("x", x), ("lbl", lbl)], grad_blobs=["x"])


def test_lstm_grads(oracle, tmp_path):
    """Backward through the reference's unrolled LSTM net (recurrent_layer
    Backward over T timesteps, cont flush at t=2) vs jax.grad of our
    lax.scan — params W_xc/b_c/W_hc and the input-sequence gradient."""
    x = RS.randn(4, 2, 5).astype(np.float32)
    cont = np.array([[0, 0], [1, 1], [0, 1], [1, 1]], np.float32)
    t = RS.randn(4, 2, 3).astype(np.float32)
    proto = """
name: "glstm"
force_backward: true
input: "x"    input_shape { dim: 4 dim: 2 dim: 5 }
input: "cont" input_shape { dim: 4 dim: 2 }
input: "t"    input_shape { dim: 4 dim: 2 dim: 3 }
layer { name: "lstm" type: "LSTM" bottom: "x" bottom: "cont" top: "h"
  recurrent_param { num_output: 3 } }
layer { name: "loss" type: "EuclideanLoss" bottom: "h" bottom: "t"
  top: "loss" }
"""
    run_grad_case(oracle, str(tmp_path), "glstm", proto,
                  [("x", x), ("cont", cont), ("t", t)],
                  grad_blobs=["x"], pgrad_layers=["lstm"])


def test_rnn_grads(oracle, tmp_path):
    x = RS.randn(3, 2, 4).astype(np.float32)
    cont = np.array([[0, 0], [1, 0], [1, 1]], np.float32)
    t = RS.randn(3, 2, 3).astype(np.float32)
    proto = """
name: "grnn"
force_backward: true
input: "x"    input_shape { dim: 3 dim: 2 dim: 4 }
input: "cont" input_shape { dim: 3 dim: 2 }
input: "t"    input_shape { dim: 3 dim: 2 dim: 3 }
layer { name: "rnn" type: "RNN" bottom: "x" bottom: "cont" top: "o"
  recurrent_param { num_output: 3 } }
layer { name: "loss" type: "EuclideanLoss" bottom: "o" bottom: "t"
  top: "loss" }
"""
    run_grad_case(oracle, str(tmp_path), "grnn", proto,
                  [("x", x), ("cont", cont), ("t", t)],
                  grad_blobs=["x"], pgrad_layers=["rnn"])
