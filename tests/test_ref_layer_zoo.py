"""Cross-IMPLEMENTATION layer zoo: ~25 layer configurations run through BOTH
this framework and the reference Caffe CPU build (native/ref_oracle, compiled
from the unmodified sources in /root/reference) with shared weights and
inputs.  Extends tests/test_ref_parity.py (whole-CNN) down to per-layer
semantics: pad/ceil pooling, LRN modes, BatchNorm scale-factor division,
grouped/dilated (de)convolution, reductions, reshapes, embeddings.

Unlike the numpy oracles in test_layer_oracles.py these expected values come
from the reference's own C++ code paths, so a convention shared by our op and
our oracle cannot hide here.
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

RS = np.random.RandomState(1234)


@pytest.fixture(scope="session")
def oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    r = subprocess.run(["bash", BUILD_SH, BUILD], capture_output=True,
                       text=True)
    if r.returncode != 0 or not os.path.exists(ORACLE):
        pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return ORACLE


def _proto(inputs, layers):
    lines = ['name: "zoo"']
    for name, shape in inputs:
        lines.append(f'input: "{name}"')
        dims = "".join(f" dim: {d}" for d in shape)
        lines.append(f"input_shape {{{dims} }}")
    lines.extend(layers)
    return "\n".join(lines)


def run_case(oracle_bin, tmp, tag, proto_text, inputs, out_blobs,
             param_override=None, rtol=1e-5, atol=1e-6):
    """inputs: list of (name, array); weights seeded deterministically and
    shared through a .caffemodel; outputs compared blob-by-blob."""
    import jax.numpy as jnp

    from caffe_rtpose_tpu.core.net import Net

    proto = os.path.join(tmp, f"{tag}.prototxt")
    open(proto, "w").write(proto_text)
    net = Net(proto, phase="TEST")

    rs = np.random.RandomState(7)
    for name in sorted(net.params):
        if param_override and name in param_override:
            net.params[name] = [jnp.asarray(a.astype(np.float32))
                                for a in param_override[name]]
            continue
        new = []
        for p in net.params[name]:
            a = np.asarray(p)
            new.append(jnp.asarray(
                (rs.randn(*a.shape) * 0.5).astype(np.float32)))
        net.params[name] = new

    weights = "-"
    if net.params:
        weights = os.path.join(tmp, f"{tag}.caffemodel")
        net.save_caffemodel(weights)

    feed = {k: v for k, v in inputs}
    ours = net.forward(feed, outputs=list(out_blobs))

    raw = os.path.join(tmp, f"{tag}.raw")
    with open(raw, "wb") as f:
        for _, v in inputs:
            f.write(np.ascontiguousarray(v, np.float32).tobytes())

    prefix = os.path.join(tmp, f"{tag}.out")
    r = subprocess.run([oracle_bin, proto, weights, raw, prefix] +
                       list(out_blobs),
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"{tag}: {r.stderr[-800:]}"
    shapes = {}
    for line in r.stdout.strip().splitlines():
        parts = line.split()
        shapes[parts[0]] = tuple(int(v) for v in parts[1:])
    for b in out_blobs:
        got = np.asarray(ours[b], np.float32)
        want = np.fromfile(f"{prefix}.{b}.raw", np.float32)
        want = want.reshape(shapes[b]) if shapes[b] else want[0]
        assert got.shape == tuple(np.shape(want)), \
            f"{tag}.{b}: shape {got.shape} vs reference {np.shape(want)}"
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=f"{tag}.{b}")


X4 = RS.randn(2, 3, 7, 9).astype(np.float32)
X2 = RS.randn(3, 8).astype(np.float32)


CASES = {
    "inner_product": (
        [("x", X2)],
        ['layer { name: "ip" type: "InnerProduct" bottom: "x" top: "y" '
         'inner_product_param { num_output: 5 '
         'weight_filler { type: "constant" } } }'],
        ["y"], {}),
    "inner_product_transpose_nobias": (
        [("x", X2)],
        ['layer { name: "ip" type: "InnerProduct" bottom: "x" top: "y" '
         'inner_product_param { num_output: 4 transpose: true '
         'bias_term: false weight_filler { type: "constant" } } }'],
        ["y"], {}),
    "pool_max_pad_ceil": (
        [("x", X4)],
        ['layer { name: "p" type: "Pooling" bottom: "x" top: "y" '
         'pooling_param { pool: MAX kernel_size: 3 stride: 2 pad: 1 } }'],
        ["y"], {}),
    "pool_ave_pad_ceil": (
        [("x", X4)],
        ['layer { name: "p" type: "Pooling" bottom: "x" top: "y" '
         'pooling_param { pool: AVE kernel_size: 3 stride: 2 pad: 1 } }'],
        ["y"], {}),
    "pool_global_max": (
        [("x", X4)],
        ['layer { name: "p" type: "Pooling" bottom: "x" top: "y" '
         'pooling_param { pool: MAX global_pooling: true } }'],
        ["y"], {}),
    "pool_rect_kernel": (
        [("x", X4)],
        ['layer { name: "p" type: "Pooling" bottom: "x" top: "y" '
         'pooling_param { pool: MAX kernel_h: 2 kernel_w: 3 stride_h: 2 '
         'stride_w: 1 } }'],
        ["y"], {}),
    "lrn_across": (
        [("x", X4)],
        ['layer { name: "l" type: "LRN" bottom: "x" top: "y" '
         'lrn_param { local_size: 5 alpha: 2.0 beta: 0.6 k: 1.5 } }'],
        ["y"], dict(rtol=1e-4)),
    "lrn_within": (
        [("x", X4)],
        ['layer { name: "l" type: "LRN" bottom: "x" top: "y" '
         'lrn_param { local_size: 3 alpha: 1.5 beta: 0.75 '
         'norm_region: WITHIN_CHANNEL } }'],
        ["y"], dict(rtol=1e-4)),
    "batch_norm_global_stats": (
        [("x", X4)],
        ['layer { name: "bn" type: "BatchNorm" bottom: "x" top: "y" '
         'batch_norm_param { use_global_stats: true eps: 0.001 } }'],
        ["y"],
        dict(param_override={"bn": [
            np.array([0.6, -1.2, 2.4]) * 4.0,   # mean * scale_factor
            np.array([1.0, 0.25, 3.0]) * 4.0,   # var * scale_factor
            np.array([4.0]),                    # scale_factor (divided out)
        ]}, rtol=1e-4)),
    "scale_bias_learned": (
        [("x", X4)],
        ['layer { name: "sc" type: "Scale" bottom: "x" top: "y" '
         'scale_param { axis: 1 bias_term: true } }'],
        ["y"], {}),
    "eltwise_sum_coeff": (
        [("a", X4), ("b", RS.randn(2, 3, 7, 9).astype(np.float32))],
        ['layer { name: "e" type: "Eltwise" bottom: "a" bottom: "b" '
         'top: "y" eltwise_param { operation: SUM coeff: 2.0 '
         'coeff: -0.5 } }'],
        ["y"], {}),
    "eltwise_prod_max": (
        [("a", X4), ("b", RS.randn(2, 3, 7, 9).astype(np.float32))],
        ['layer { name: "p" type: "Eltwise" bottom: "a" bottom: "b" '
         'top: "yp" eltwise_param { operation: PROD } }',
         'layer { name: "m" type: "Eltwise" bottom: "a" bottom: "b" '
         'top: "ym" eltwise_param { operation: MAX } }'],
        ["yp", "ym"], {}),
    "power": (
        [("x", np.abs(X4) + 0.1)],
        ['layer { name: "pw" type: "Power" bottom: "x" top: "y" '
         'power_param { power: 2.0 scale: 0.5 shift: 1.0 } }'],
        ["y"], dict(rtol=1e-4)),
    "exp_log": (
        [("x", np.abs(X4) * 0.5 + 0.2)],
        ['layer { name: "ex" type: "Exp" bottom: "x" top: "ye" '
         'exp_param { base: 2.0 scale: 0.7 shift: 0.1 } }',
         'layer { name: "lg" type: "Log" bottom: "x" top: "yl" '
         'log_param { base: 10.0 scale: 2.0 shift: 0.5 } }'],
        ["ye", "yl"], dict(rtol=1e-4)),
    "neurons": (
        [("x", X4)],
        ['layer { name: "a" type: "AbsVal" bottom: "x" top: "ya" }',
         'layer { name: "b" type: "BNLL" bottom: "x" top: "yb" }',
         'layer { name: "e" type: "ELU" bottom: "x" top: "yc" '
         'elu_param { alpha: 0.7 } }',
         'layer { name: "t" type: "Threshold" bottom: "x" top: "yd" '
         'threshold_param { threshold: 0.3 } }',
         'layer { name: "d" type: "Dropout" bottom: "x" top: "yf" '
         'dropout_param { dropout_ratio: 0.4 } }'],
        ["ya", "yb", "yc", "yd", "yf"], dict(rtol=1e-4)),
    "prelu_per_channel": (
        [("x", X4)],
        ['layer { name: "pr" type: "PReLU" bottom: "x" top: "y" }'],
        ["y"], {}),
    "mvn_variants": (
        [("x", X4)],
        ['layer { name: "m1" type: "MVN" bottom: "x" top: "y1" }',
         'layer { name: "m2" type: "MVN" bottom: "x" top: "y2" '
         'mvn_param { normalize_variance: false } }',
         'layer { name: "m3" type: "MVN" bottom: "x" top: "y3" '
         'mvn_param { across_channels: true } }'],
        ["y1", "y2", "y3"], dict(rtol=2e-4, atol=1e-5)),
    "argmax_topk_axis": (
        [("x", X4)],
        ['layer { name: "am" type: "ArgMax" bottom: "x" top: "y" '
         'argmax_param { axis: 1 } }'],
        ["y"], {}),
    "crop_two_bottoms": (
        [("x", X4), ("ref", np.zeros((2, 3, 4, 5), np.float32))],
        ['layer { name: "cr" type: "Crop" bottom: "x" bottom: "ref" '
         'top: "y" crop_param { axis: 2 offset: 1 offset: 2 } }'],
        ["y"], {}),
    "reduction_ops": (
        [("x", X4)],
        ['layer { name: "r1" type: "Reduction" bottom: "x" top: "y1" '
         'reduction_param { operation: SUM axis: 1 coeff: 2.0 } }',
         'layer { name: "r2" type: "Reduction" bottom: "x" top: "y2" '
         'reduction_param { operation: MEAN axis: 2 } }',
         'layer { name: "r3" type: "Reduction" bottom: "x" top: "y3" '
         'reduction_param { operation: ASUM } }',
         'layer { name: "r4" type: "Reduction" bottom: "x" top: "y4" '
         'reduction_param { operation: SUMSQ axis: 3 } }'],
        ["y1", "y2", "y3", "y4"], dict(rtol=1e-4)),
    "tile_flatten_reshape": (
        [("x", X4)],
        ['layer { name: "ti" type: "Tile" bottom: "x" top: "y1" '
         'tile_param { axis: 1 tiles: 3 } }',
         'layer { name: "fl" type: "Flatten" bottom: "x" top: "y2" }',
         'layer { name: "rs" type: "Reshape" bottom: "x" top: "y3" '
         'reshape_param { shape { dim: 0 dim: -1 dim: 9 } } }'],
        ["y1", "y2", "y3"], {}),
    "slice_points": (
        [("x", X4)],
        ['layer { name: "sl" type: "Slice" bottom: "x" top: "y1" '
         'top: "y2" top: "y3" slice_param { axis: 1 slice_point: 1 '
         'slice_point: 2 } }'],
        ["y1", "y2", "y3"], {}),
    "embed_with_bias": (
        [("x", RS.randint(0, 10, (4, 1)).astype(np.float32))],
        ['layer { name: "em" type: "Embed" bottom: "x" top: "y" '
         'embed_param { num_output: 6 input_dim: 10 bias_term: true '
         'weight_filler { type: "constant" } } }'],
        ["y"], {}),
    "batch_reindex": (
        [("x", X2), ("idx", np.array([2., 0., 1., 2., 0.], np.float32))],
        ['layer { name: "br" type: "BatchReindex" bottom: "x" '
         'bottom: "idx" top: "y" }'],
        ["y"], {}),
    "conv_group_dilated_rect": (
        [("x", RS.randn(1, 4, 9, 11).astype(np.float32))],
        ['layer { name: "cv" type: "Convolution" bottom: "x" top: "y" '
         'convolution_param { num_output: 6 group: 2 kernel_h: 3 '
         'kernel_w: 2 stride_h: 2 stride_w: 1 pad_h: 1 pad_w: 2 '
         'dilation: 2 weight_filler { type: "constant" } } }'],
        ["y"], dict(rtol=1e-4)),
    "deconv_grouped": (
        [("x", RS.randn(1, 4, 5, 6).astype(np.float32))],
        ['layer { name: "dc" type: "Deconvolution" bottom: "x" top: "y" '
         'convolution_param { num_output: 4 group: 2 kernel_size: 3 '
         'stride: 2 pad: 1 weight_filler { type: "constant" } } }'],
        ["y"], dict(rtol=1e-4)),
    "maximum_cpm_head": (
        [("x", X4)],
        ['layer { name: "mx" type: "Maximum" bottom: "x" top: "y" }'],
        ["y"], {}),
    "argmax_topk_maxval": (
        [("x", X4.reshape(2, 3 * 63))],
        ['layer { name: "a1" type: "ArgMax" bottom: "x" top: "y1" '
         'argmax_param { top_k: 3 } }',
         'layer { name: "a2" type: "ArgMax" bottom: "x" top: "y2" '
         'argmax_param { top_k: 2 out_max_val: true } }'],
        ["y1", "y2"], {}),
    "softmax_spatial_axis": (
        [("x", X4)],
        ['layer { name: "sm" type: "Softmax" bottom: "x" top: "y" '
         'softmax_param { axis: 2 } }'],
        ["y"], dict(rtol=1e-4)),
    # recurrent family: the reference runs these through an internal
    # unrolled Net (recurrent_layer.cpp); cont=0 at t=2 of stream 0
    # exercises the mid-sequence state flush
    "lstm_seq": (
        [("x", RS.randn(4, 2, 5).astype(np.float32)),
         ("cont", np.array([[0, 0], [1, 1], [0, 1], [1, 1]], np.float32))],
        ['layer { name: "lstm" type: "LSTM" bottom: "x" bottom: "cont" '
         'top: "y" recurrent_param { num_output: 3 '
         'weight_filler { type: "constant" } } }'],
        ["y"], dict(rtol=1e-5, atol=1e-6)),
    "rnn_seq": (
        [("x", RS.randn(3, 2, 4).astype(np.float32)),
         ("cont", np.array([[0, 0], [1, 0], [1, 1]], np.float32))],
        ['layer { name: "rnn" type: "RNN" bottom: "x" bottom: "cont" '
         'top: "y" recurrent_param { num_output: 3 '
         'weight_filler { type: "constant" } } }'],
        ["y"], dict(rtol=1e-5, atol=1e-6)),
    "lstm_unit_step": (
        [("c_prev", RS.randn(1, 3, 4).astype(np.float32)),
         ("gates", RS.randn(1, 3, 16).astype(np.float32)),
         ("cont", np.array([[1., 0., 1.]], np.float32))],
        ['layer { name: "u" type: "LSTMUnit" bottom: "c_prev" '
         'bottom: "gates" bottom: "cont" top: "c" top: "h" }'],
        ["c", "h"], {}),
    "spp_pyramid_max": (
        [("x", X4)],
        ['layer { name: "sp" type: "SPP" bottom: "x" top: "y" '
         'spp_param { pyramid_height: 3 } }'],
        ["y"], {}),
    "spp_pyramid_ave": (
        [("x", X4)],
        ['layer { name: "sp" type: "SPP" bottom: "x" top: "y" '
         'spp_param { pyramid_height: 2 pool: AVE } }'],
        ["y"], {}),
    "accuracy_per_class": (
        [("x", RS.randn(8, 4).astype(np.float32)),
         ("lab", np.array([0., 3., 2., 1., 0., 2., 2., 1.], np.float32))],
        ['layer { name: "ac" type: "Accuracy" bottom: "x" bottom: "lab" '
         'top: "y" top: "ypc" }'],
        ["y", "ypc"], {}),
    "accuracy_topk_ignore": (
        [("x", RS.randn(6, 5).astype(np.float32)),
         ("lab", np.array([0., 3., 2., 1., 4., 2.], np.float32))],
        ['layer { name: "ac" type: "Accuracy" bottom: "x" bottom: "lab" '
         'top: "y" accuracy_param { top_k: 2 ignore_label: 2 } }'],
        ["y"], {}),
    "im2col_layer": (
        [("x", X4)],
        ['layer { name: "ic" type: "Im2col" bottom: "x" top: "y" '
         'convolution_param { kernel_size: 3 stride: 2 pad: 1 } }'],
        ["y"], {}),
    "bias_two_bottom": (
        [("x", X4), ("b", RS.randn(3, 7).astype(np.float32))],
        ['layer { name: "bi" type: "Bias" bottom: "x" bottom: "b" '
         'top: "y" bias_param { axis: 1 } }'],
        ["y"], {}),
    "dummy_data_constant": (
        [("x", X2)],
        ['layer { name: "dd" type: "DummyData" top: "y1" '
         'dummy_data_param { shape { dim: 2 dim: 3 } '
         'data_filler { type: "constant" value: 2.5 } } }',
         # silence eats a blob without tops; x must still flow through
         'layer { name: "sil" type: "Silence" bottom: "y1" }',
         'layer { name: "id" type: "Power" bottom: "x" top: "y2" }'],
        ["y2"], {}),
    "lstm_static_expose": (
        [("x", RS.randn(3, 2, 4).astype(np.float32)),
         ("cont", np.array([[1, 1], [1, 0], [1, 1]], np.float32)),
         ("xs", RS.randn(2, 6).astype(np.float32)),
         ("h0", RS.randn(1, 2, 3).astype(np.float32)),
         ("c0", RS.randn(1, 2, 3).astype(np.float32))],
        ['layer { name: "lstm" type: "LSTM" bottom: "x" bottom: "cont" '
         'bottom: "xs" bottom: "h0" bottom: "c0" top: "y" top: "ht" '
         'top: "ct" recurrent_param { num_output: 3 expose_hidden: true '
         'weight_filler { type: "constant" } } }'],
        ["y", "ht", "ct"], dict(rtol=1e-5, atol=1e-6)),
    "rnn_static_expose": (
        [("x", RS.randn(3, 2, 5).astype(np.float32)),
         ("cont", np.array([[1, 1], [0, 1], [1, 1]], np.float32)),
         ("xs", RS.randn(2, 4).astype(np.float32)),
         ("h0", RS.randn(1, 2, 3).astype(np.float32))],
        ['layer { name: "rnn" type: "RNN" bottom: "x" bottom: "cont" '
         'bottom: "xs" bottom: "h0" top: "y" top: "ht" '
         'recurrent_param { num_output: 3 expose_hidden: true '
         'weight_filler { type: "constant" } } }'],
        ["y", "ht"], dict(rtol=1e-5, atol=1e-6)),
}


def test_filter_kept_prefix_matches_reference(oracle, tmp_path):
    """Filter deviates by design (static batch, zero tail — see
    build_filter); the kept PREFIX must still match the reference's
    data-dependent output exactly, row for row."""
    import jax.numpy as jnp

    from caffe_rtpose_tpu.core.net import Net

    x = RS.randn(5, 3, 2, 2).astype(np.float32)
    sel = np.array([1., 0., 1., 1., 0.], np.float32)
    proto_text = _proto([("x", x.shape), ("sel", (5,))],
                        ['layer { name: "ft" type: "Filter" bottom: "x" '
                         'bottom: "sel" top: "y" }'])
    proto = os.path.join(str(tmp_path), "filter.prototxt")
    open(proto, "w").write(proto_text)
    net = Net(proto, phase="TEST")
    ours = np.asarray(net.forward({"x": x, "sel": sel}, outputs=["y"])["y"])

    raw = os.path.join(str(tmp_path), "filter.raw")
    with open(raw, "wb") as f:
        f.write(np.ascontiguousarray(x, np.float32).tobytes())
        f.write(np.ascontiguousarray(sel, np.float32).tobytes())
    prefix = os.path.join(str(tmp_path), "filter.out")
    r = subprocess.run([oracle, proto, "-", raw, prefix, "y"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    want = np.fromfile(f"{prefix}.y.raw", np.float32).reshape(3, 3, 2, 2)
    assert ours.shape == (5, 3, 2, 2)          # static full batch
    np.testing.assert_array_equal(ours[:3], want)   # kept rows, in order
    np.testing.assert_array_equal(ours[3:], 0.0)    # zero tail


@pytest.mark.parametrize("tag", sorted(CASES))
def test_layer_zoo_matches_reference_build(oracle, tmp_path, tag):
    inputs, layers, outs, kw = CASES[tag]
    proto_text = _proto([(n, v.shape) for n, v in inputs], layers)
    run_case(oracle, str(tmp_path), tag, proto_text, inputs, outs, **kw)
