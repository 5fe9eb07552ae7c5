"""pycaffe-parity API tests: Net facade (blobs/params/forward/backward),
Transformer/io, Classifier oversampling, draw."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from caffe_rtpose_tpu import api as caffe

TINY = """
name: "tiny"
input: "data"
input_dim: 2 input_dim: 3 input_dim: 8 input_dim: 8
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 pad: 1 kernel_size: 3
    weight_filler { type: "xavier" } } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "fc" type: "InnerProduct" bottom: "conv1" top: "prob"
  inner_product_param { num_output: 5 weight_filler { type: "xavier" } } }
"""


def test_net_facade_forward():
    net = caffe.Net(TINY, caffe.TEST)
    assert net.inputs == ["data"]
    assert net.outputs == ["prob"]
    x = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
    out = net.forward(data=x)
    assert out["prob"].shape == (2, 5)
    # blob cache refreshed, caffe layout
    assert net.blobs["conv1"].data.shape == (2, 4, 8, 8)
    np.testing.assert_allclose(net.blobs["prob"].data, out["prob"])


def test_net_params_edit_roundtrip():
    net = caffe.Net(TINY, caffe.TEST)
    x = np.random.RandomState(1).randn(2, 3, 8, 8).astype(np.float32)
    out1 = net.forward(data=x)["prob"]
    net.params["fc"][1].data[:] = 10.0  # edit bias in caffe layout
    out2 = net.forward(data=x)["prob"]
    np.testing.assert_allclose(out2, out1 + 10.0, rtol=1e-4)


def test_net_backward_matches_numeric():
    net = caffe.Net(TINY, caffe.TEST)
    x = np.random.RandomState(2).randn(2, 3, 8, 8).astype(np.float32)
    net.forward(data=x)
    g = net.backward(prob=np.ones((2, 5), np.float32))
    assert g["data"].shape == (2, 3, 8, 8)
    # numeric check on one input element
    eps = 1e-2
    xp = x.copy()
    xp[0, 0, 3, 3] += eps
    xm = x.copy()
    xm[0, 0, 3, 3] -= eps
    fp = net.forward(data=xp)["prob"].sum()
    fm = net.forward(data=xm)["prob"].sum()
    numeric = (fp - fm) / (2 * eps)
    assert g["data"][0, 0, 3, 3] == pytest.approx(numeric, rel=0.05, abs=1e-3)
    # param diffs populated
    assert np.abs(net.params["fc"][0].diff).sum() > 0


def test_save_and_copy_from(tmp_path):
    net = caffe.Net(TINY, caffe.TEST)
    x = np.random.RandomState(3).randn(2, 3, 8, 8).astype(np.float32)
    out1 = net.forward(data=x)["prob"]
    p = str(tmp_path / "w.caffemodel")
    net.save(p)
    net2 = caffe.Net(TINY, p, caffe.TEST)
    np.testing.assert_allclose(net2.forward(data=x)["prob"], out1, rtol=1e-5)


def test_transformer_roundtrip():
    t = caffe.Transformer({"data": (1, 3, 8, 8)})
    t.set_transpose("data", (2, 0, 1))
    t.set_raw_scale("data", 255.0)
    t.set_mean("data", np.array([10.0, 20.0, 30.0]))
    t.set_channel_swap("data", (2, 1, 0))
    img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    x = t.preprocess("data", img)
    assert x.shape == (3, 8, 8)
    back = t.deprocess("data", x)
    np.testing.assert_allclose(back, img.transpose(2, 0, 1).transpose(1, 2, 0), rtol=1e-5, atol=1e-5)


def test_oversample_and_classifier():
    imgs = [np.random.RandomState(0).rand(10, 10, 3).astype(np.float32)]
    crops = caffe.oversample(imgs, (8, 8))
    assert crops.shape == (10, 8, 8, 3)
    # mirrored pairs
    np.testing.assert_allclose(crops[1], crops[0][:, ::-1])

    clf = caffe.Classifier(TINY, image_dims=(10, 10))
    probs = clf.predict([np.random.RandomState(1).rand(12, 14, 3).astype(np.float32)])
    assert probs.shape == (1, 5)


def test_draw():
    from caffe_rtpose_tpu.proto import prototxt

    net_param = prototxt.parse(TINY)
    txt = caffe.draw_net_text(net_param)
    assert "conv1 (Convolution)" in txt
    dot = caffe.draw_net_dot(net_param)
    assert dot.startswith("digraph") and '"conv1"' in dot


class TestCoordMap:
    def test_vgg_trunk_map(self):
        """coord_map through the COCO deploy trunk: stride-8 feature coords
        map back to input pixels (pycaffe coord_map parity)."""
        from caffe_rtpose_tpu import coord_map as cm
        from caffe_rtpose_tpu.core.net import Net

        net = Net("/root/reference/model/coco/pose_deploy_linevec.prototxt",
                  phase="TEST", input_shapes={"image": (1, 3, 80, 128)})
        a, b = cm.coord_map_from_to(net, "conv4_4_CPM", "image")
        # three 2x2/2 pools -> a=8; SAME-padded 3x3 convs contribute 0 offset
        assert a == 8.0
        assert b == 3.5  # pool centers: 0.5 + 2*0.5 + 4*0.5 per pooling chain

    def test_identity_and_errors(self):
        from caffe_rtpose_tpu import coord_map as cm
        from caffe_rtpose_tpu.core.net import Net

        proto = {
            "name": "t",
            "input": ["x"],
            "input_shape": [{"dim": [1, 3, 8, 8]}],
            "layer": [
                {"name": "c", "type": "Convolution", "bottom": ["x"], "top": ["y"],
                 "convolution_param": {"num_output": 2, "kernel_size": [3], "pad": [1]}},
                {"name": "r", "type": "ReLU", "bottom": ["y"], "top": ["y"]},
                {"name": "ip", "type": "InnerProduct", "bottom": ["y"], "top": ["z"],
                 "inner_product_param": {"num_output": 4}},
            ],
        }
        net = Net(proto, phase="TEST")
        a, b = cm.coord_map_from_to(net, "y", "x")
        assert (a, b) == (1.0, 0.0)
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            cm.coord_map_from_to(net, "z", "x")  # InnerProduct has no map


class TestCoordMapPoolingHW:
    def test_kernel_h_fields_respected(self):
        """Review regression: pooling via kernel_h/kernel_w (+stride_h) must
        produce the same map as kernel_size/stride."""
        from caffe_rtpose_tpu import coord_map as cm
        from caffe_rtpose_tpu.core.net import Net

        def net_for(pool_param):
            return Net({
                "name": "p",
                "input": ["x"],
                "input_shape": [{"dim": [1, 1, 16, 16]}],
                "layer": [{"name": "pl", "type": "Pooling", "bottom": ["x"],
                           "top": ["y"], "pooling_param": pool_param}],
            }, phase="TEST")

        a1, b1 = cm.coord_map_from_to(net_for(
            {"kernel_size": 3, "stride": 2}), "y", "x")
        a2, b2 = cm.coord_map_from_to(net_for(
            {"kernel_h": 3, "kernel_w": 3, "stride_h": 2, "stride_w": 2}), "y", "x")
        assert (a1, b1) == (2.0, 1.0)
        assert (a2, b2) == (a1, b1)


class TestLayersFacade:
    def test_layers_and_names(self):
        net = caffe.Net(TINY, caffe.TEST)
        assert net._layer_names == ["conv1", "relu1", "fc"]
        assert [l.type for l in net.layers] == ["Convolution", "ReLU", "InnerProduct"]
        # param blobs shared with net.params facades
        assert net.layers[0].blobs is not None
        assert net.layers[0].blobs[0].data.shape == (4, 3, 3, 3)
        assert net.top_names["conv1"] == ["conv1"]
        assert net.bottom_names["fc"] == ["conv1"]


# ---- pycaffe singleton + Net management surface (reference
# python/caffe/test/test_net.py, test_layer_type_list.py)

def _tiny_proto(tmp_path, name="t"):
    p = tmp_path / f"{name}.prototxt"
    p.write_text("""
name: "tiny"
input: "x" input_shape { dim: 1 dim: 2 dim: 4 dim: 4 }
layer { name: "c" type: "Convolution" bottom: "x" top: "y"
  convolution_param { num_output: 3 kernel_size: 3 pad: 1
    weight_filler { type: "gaussian" std: 0.2 } } }
""")
    return str(p)


def test_layer_type_list():
    types = caffe.layer_type_list()
    for t in ("Convolution", "Pooling", "LSTM", "Data", "Nms", "ImResize",
              "EuclideanmaskLoss", "Python"):
        assert t in types, t


def test_clear_param_diffs(tmp_path):
    net = caffe.Net(_tiny_proto(tmp_path), caffe.TEST)
    net.params["c"][0].diff[...] = 3.0
    net.blobs["x"].diff[...] = 2.0
    net.clear_param_diffs()
    assert not net.params["c"][0].diff.any()
    # activation-blob diffs stay (ClearParamDiffs touches learnable
    # params only)
    assert net.blobs["x"].diff.all()


def test_share_with_and_hdf5(tmp_path):
    a = caffe.Net(_tiny_proto(tmp_path, "a"), caffe.TEST)
    b = caffe.Net(_tiny_proto(tmp_path, "b"), caffe.TEST)
    b.params["c"][0].data[...] = 7.0
    a.share_with(b)
    np.testing.assert_array_equal(a.params["c"][0].data, 7.0)

    h5 = str(tmp_path / "w.h5")
    a.save_hdf5(h5)
    c = caffe.Net(_tiny_proto(tmp_path, "c"), caffe.TEST)
    c.load_hdf5(h5)
    np.testing.assert_array_equal(c.params["c"][0].data, 7.0)


def test_set_random_seed_determinism(tmp_path):
    caffe.set_random_seed(1234)
    w1 = caffe.Net(_tiny_proto(tmp_path), caffe.TEST).params["c"][0].data
    w1b = caffe.Net(_tiny_proto(tmp_path), caffe.TEST).params["c"][0].data
    caffe.set_random_seed(1234)
    w2 = caffe.Net(_tiny_proto(tmp_path), caffe.TEST).params["c"][0].data
    caffe.set_random_seed(99)
    w3 = caffe.Net(_tiny_proto(tmp_path), caffe.TEST).params["c"][0].data
    caffe._default_seed = None  # don't leak into other tests
    np.testing.assert_array_equal(w1, w2)  # same seed -> same first net
    # the stream advances: a second net under one seeding differs
    # (reference semantics: one global RNG, its stream moves on)
    assert not np.array_equal(w1, w1b)
    assert not np.array_equal(w1, w3)


STAGED_NET = """
name: "staged"
input: "data" input_shape { dim: 1 dim: 1 dim: 2 dim: 2 }
layer { name: "NoLevel" type: "ReLU" bottom: "data" top: "NoLevel" }
layer { name: "Level0" type: "ReLU" bottom: "data" top: "Level0"
  include { min_level: 0 max_level: 0 } }
layer { name: "Level1" type: "ReLU" bottom: "data" top: "Level1"
  include { min_level: 1 } }
layer { name: "A" type: "ReLU" bottom: "data" top: "A"
  include { stage: "A" } }
layer { name: "B" type: "ReLU" bottom: "data" top: "B"
  include { stage: "B" } }
layer { name: "AorB" type: "ReLU" bottom: "data" top: "AorB"
  include { stage: "A" } include { stage: "B" } }
layer { name: "AandB" type: "ReLU" bottom: "data" top: "AandB"
  include { stage: "A" stage: "B" } }
"""


def _staged(tmp_path, **kw):
    p = tmp_path / "staged.prototxt"
    p.write_text(STAGED_NET)
    net = caffe.Net(str(p), caffe.TEST, **kw)
    return [b for b in net.blobs if b != "data"]


def test_net_level_filtering(tmp_path):
    assert _staged(tmp_path) == ["NoLevel", "Level0"]
    assert _staged(tmp_path, level=1) == ["NoLevel", "Level1"]


def test_net_stage_filtering(tmp_path):
    assert _staged(tmp_path, stages=["A"]) == ["NoLevel", "Level0", "A",
                                               "AorB"]
    assert _staged(tmp_path, stages=["B"]) == ["NoLevel", "Level0", "B",
                                               "AorB"]
    assert _staged(tmp_path, stages=["A", "B"]) == [
        "NoLevel", "Level0", "A", "B", "AorB", "AandB"]


def test_mode_shims_run():
    caffe.set_mode_cpu()
    caffe.set_mode_gpu()
    caffe.set_device(0)
    caffe.set_mode_cpu()


# ---- caffe.io blobproto/datum helpers (reference python/caffe/test/test_io.py)

def test_blobproto_array_roundtrip():
    rs = np.random.RandomState(3)
    for shape in [(2, 3, 4), (5,), (1, 2, 3, 4)]:
        a = rs.randn(*shape)
        blob = caffe.array_to_blobproto(a)
        np.testing.assert_allclose(caffe.blobproto_to_array(blob), a)
    # legacy 4D header form
    legacy = {"num": 1, "channels": 2, "height": 2, "width": 3,
              "data": list(range(12))}
    assert caffe.blobproto_to_array(legacy).shape == (1, 2, 2, 3)
    # scalar: reference asserts (1,1,1,1) blob round-trips via legacy dims
    arr = np.ones((1, 1, 1, 1))
    np.testing.assert_array_equal(
        caffe.blobproto_to_array(caffe.array_to_blobproto(arr)), arr)


def test_blobprotovector_str_roundtrip():
    rs = np.random.RandomState(4)
    arrs = [rs.randn(2, 3), rs.randn(4)]
    s = caffe.arraylist_to_blobprotovector_str(arrs)
    back = caffe.blobprotovector_str_to_arraylist(s)
    for a, b in zip(arrs, back):
        np.testing.assert_allclose(a, b)
    # the serialized bytes parse through the generated protobuf classes too
    try:
        from caffe_rtpose_tpu.proto import caffe_pb2
    except ImportError:
        return
    vec = caffe_pb2.BlobProtoVector()
    vec.ParseFromString(s)
    assert len(vec.blobs) == 2 and list(vec.blobs[0].shape.dim) == [2, 3]


def test_datum_array_roundtrip():
    rs = np.random.RandomState(5)
    u8 = rs.randint(0, 256, (3, 4, 5), np.uint8)
    d = caffe.array_to_datum(u8, label=7)
    assert d["label"] == 7 and d["data"] == u8.tobytes()
    np.testing.assert_array_equal(caffe.datum_to_array(d), u8)
    f = rs.randn(2, 3, 4).astype(np.float32)
    d2 = caffe.array_to_datum(f)
    np.testing.assert_allclose(caffe.datum_to_array(d2), f, rtol=1e-6)
    with pytest.raises(ValueError):
        caffe.array_to_datum(np.zeros((2, 2)))


# ---- review-fix regressions (round 3) ------------------------------------

_XOR_NET = """
name: "t"
input: "x"
input_shape { dim: 2 dim: 3 }
input: "t"
input_shape { dim: 2 dim: 1 }
layer { name: "ip" type: "InnerProduct" bottom: "x" top: "p"
  inner_product_param { num_output: 1
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "l" type: "EuclideanLoss" bottom: "p" bottom: "t" top: "l" }
"""


def _solver_files(tmp_path, extra=""):
    net = tmp_path / "t.prototxt"
    net.write_text(_XOR_NET)
    sol = tmp_path / "s.prototxt"
    sol.write_text(
        f'net: "{net}"\nbase_lr: 0.1\nlr_policy: "fixed"\nmax_iter: 10\n'
        + extra)
    return sol


def test_solver_test_interval_with_external_inputs(tmp_path, capsys):
    """A test net declaring external inputs must not crash TestAll: the
    reference forwards with current (zero-initialized) blob contents."""
    sol = _solver_files(tmp_path, "test_interval: 2\ntest_iter: 1\n")
    rs = np.random.RandomState(0)
    s = caffe.SGDSolver(str(sol), data_fn=lambda it: {
        "x": rs.randn(2, 3).astype(np.float32),
        "t": rs.randn(2, 1).astype(np.float32)})
    s.step(3)  # crosses iteration 2 -> runs the test net on zeros
    assert "Testing net (#0)" in capsys.readouterr().out


def test_solver_test_data_fn_feeds_test_net(tmp_path):
    sol = _solver_files(tmp_path, "test_interval: 2\ntest_iter: 1\n")
    rs = np.random.RandomState(1)
    seen = []

    def tfn(it):
        seen.append(it)
        return {"x": np.ones((2, 3), np.float32),
                "t": np.zeros((2, 1), np.float32)}

    s = caffe.SGDSolver(str(sol), data_fn=lambda it: {
        "x": rs.randn(2, 3).astype(np.float32),
        "t": rs.randn(2, 1).astype(np.float32)}, test_data_fn=tfn)
    s.step(3)
    assert seen  # the custom feed was used


def test_solver_net_facade_param_edit_writes_through(tmp_path):
    """solver.net.params edits must reach training (reference pycaffe
    params alias the shared blobs) — both by assignment and in place."""
    sol = _solver_files(tmp_path)
    rs = np.random.RandomState(2)
    data_fn = lambda it: {  # noqa: E731
        "x": rs.randn(2, 3).astype(np.float32),
        "t": rs.randn(2, 1).astype(np.float32)}
    s = caffe.SGDSolver(str(sol), data_fn=data_fn)
    w = np.full((1, 3), 0.25, np.float32)
    s.net.params["ip"][0].data[...] = w  # in-place edit (pycaffe idiom)
    out = s.net.forward(["p"], x=np.eye(3, dtype=np.float32)[:2] * 4.0,
                        t=np.zeros((2, 1), np.float32))
    np.testing.assert_allclose(out["p"], [[1.0], [1.0]], rtol=1e-5)
    # the edit reached the core net (not just the facade's copy)
    core_w = np.asarray(s._solver.net.params["ip"][0]).reshape(1, 3)
    np.testing.assert_allclose(core_w, w)
    # and training proceeds FROM the edited weights, then refreshes the
    # facade with the learned (different) values rather than re-clobbering
    s.step(1)
    # reads are live after step() (reference params alias the net blobs):
    # the facade shows the TRAINED weights without an intervening forward,
    # via lazy re-pull (no per-step device fetch)
    assert s.net._params_stale
    assert not np.allclose(s.net.params["ip"][0].data, w)
    assert not s.net._params_stale
    np.testing.assert_allclose(
        s.net.params["ip"][0].data,
        np.asarray(s._solver.net.params["ip"][0]).reshape(1, 3), rtol=1e-6)
    out2 = s.net.forward(["p"], x=np.eye(3, dtype=np.float32)[:2] * 4.0,
                         t=np.zeros((2, 1), np.float32))
    assert not np.allclose(out2["p"], [[1.0], [1.0]])


def test_prefetch_loader_propagates_worker_errors():
    from caffe_rtpose_tpu.training.datasets import prefetch_loader

    def bad_source():
        yield {"x": np.zeros(3)}
        raise RuntimeError("device OOM in stage()")

    it = prefetch_loader(bad_source())
    next(it)
    with pytest.raises(RuntimeError, match="device OOM"):
        next(it)
