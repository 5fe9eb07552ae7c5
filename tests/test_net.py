"""Graph runtime tests: inline-prototxt fixtures (the reference test_net.cpp
pattern), weight load/save round-trips, phase filtering, and an end-to-end
build+forward of the shipped COCO deploy net."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from caffe_rtpose_tpu.core.net import Net
from caffe_rtpose_tpu.proto import caffemodel

REF_COCO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"

TINY = """
name: "tiny"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
layer {
  name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 pad: 1 kernel_size: 3
    weight_filler { type: "gaussian" std: 0.1 } }
}
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer {
  name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 }
}
layer {
  name: "fc" type: "InnerProduct" bottom: "pool1" top: "fc"
  inner_product_param { num_output: 5 weight_filler { type: "xavier" } }
}
"""


def test_tiny_net_shapes():
    net = Net(TINY)
    assert net.input_names == ["data"]
    assert net.blob_shape("conv1") == (1, 4, 8, 8)
    assert net.blob_shape("pool1") == (1, 4, 4, 4)
    assert net.blob_shape("fc") == (1, 5)
    out = net.forward(data=np.random.RandomState(0).randn(1, 3, 8, 8).astype(np.float32))
    assert out["fc"].shape == (1, 5)


def test_forward_matches_manual_composition():
    rs = np.random.RandomState(1)
    net = Net(TINY)
    x = rs.randn(1, 3, 8, 8).astype(np.float32)
    w = rs.randn(4, 3, 3, 3).astype(np.float32)
    b = rs.randn(4).astype(np.float32)
    fw = rs.randn(5, 4 * 4 * 4).astype(np.float32)
    fb = rs.randn(5).astype(np.float32)
    net.load_weights({"conv1": [w, b], "fc": [fw, fb]})

    import torch

    ref = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1)
    ref = torch.relu(ref)
    ref = torch.nn.functional.max_pool2d(ref, 2, 2)
    ref = ref.reshape(1, -1) @ torch.from_numpy(fw).T + torch.from_numpy(fb)
    out = net.forward(data=x)
    np.testing.assert_allclose(out["fc"], ref.numpy(), rtol=1e-4, atol=1e-4)


def test_inplace_and_multiconsumer():
    text = """
    input: "x" input_dim: 1 input_dim: 2 input_dim: 4 input_dim: 4
    layer { name: "r" type: "ReLU" bottom: "x" top: "x" }
    layer { name: "s1" type: "Power" bottom: "x" top: "a" power_param { scale: 2.0 } }
    layer { name: "s2" type: "Power" bottom: "x" top: "b" power_param { scale: 3.0 } }
    layer { name: "add" type: "Eltwise" bottom: "a" bottom: "b" top: "y" }
    """
    net = Net(text)
    x = np.full((1, 2, 4, 4), -1.0, np.float32)
    x[0, 0, 0, 0] = 2.0
    out = net.forward(x=x)
    expect = np.maximum(x, 0) * 5.0
    np.testing.assert_allclose(out["y"], expect)


def test_phase_filtering():
    text = """
    input: "x" input_dim: 1 input_dim: 2 input_dim: 4 input_dim: 4
    layer { name: "tr" type: "Power" bottom: "x" top: "y"
            include { phase: TRAIN } power_param { scale: 2.0 } }
    layer { name: "te" type: "Power" bottom: "x" top: "y"
            include { phase: TEST } power_param { scale: 3.0 } }
    """
    net_tr = Net(text, phase="TRAIN")
    net_te = Net(text, phase="TEST")
    x = np.ones((1, 2, 4, 4), np.float32)
    np.testing.assert_allclose(net_tr.forward(x=x)["y"], 2 * x)
    np.testing.assert_allclose(net_te.forward(x=x)["y"], 3 * x)


def test_concat_slice_axis_mapping():
    text = """
    input: "x" input_dim: 1 input_dim: 4 input_dim: 3 input_dim: 3
    layer { name: "sl" type: "Slice" bottom: "x" top: "p" top: "q"
            slice_param { axis: 1 slice_point: 1 } }
    layer { name: "cat" type: "Concat" bottom: "q" bottom: "p" top: "y"
            concat_param { axis: 1 } }
    """
    net = Net(text)
    x = np.random.RandomState(2).randn(1, 4, 3, 3).astype(np.float32)
    out = net.forward(x=x)
    expect = np.concatenate([x[:, 1:], x[:, :1]], axis=1)
    np.testing.assert_allclose(out["y"], expect)


def test_weight_save_load_roundtrip(tmp_path):
    net = Net(TINY, seed=3)
    p = str(tmp_path / "w.caffemodel")
    net.save_caffemodel(p)
    net2 = Net(TINY, seed=99)
    assert net2.load_weights(p) == 2
    x = np.random.RandomState(4).randn(1, 3, 8, 8).astype(np.float32)
    np.testing.assert_allclose(net.forward(data=x)["fc"], net2.forward(data=x)["fc"], rtol=1e-5)


def test_dropout_test_phase_identity():
    text = """
    input: "x" input_dim: 1 input_dim: 2 input_dim: 4 input_dim: 4
    layer { name: "d" type: "Dropout" bottom: "x" top: "y"
            dropout_param { dropout_ratio: 0.5 } }
    """
    net = Net(text, phase="TEST")
    x = np.random.RandomState(5).randn(1, 2, 4, 4).astype(np.float32)
    np.testing.assert_allclose(net.forward(x=x)["y"], x)


@pytest.mark.skipif(not os.path.exists(REF_COCO), reason="reference not mounted")
def test_build_coco_deploy_net():
    """Build the full 183-layer COCO deploy graph at a small resolution and
    check the documented output shapes (SURVEY.md §2d)."""
    H, W = 64, 80
    net = Net(REF_COCO, input_shapes={"image": (1, 3, H, W)})
    assert net.blob_shape("concat_stage7") == (1, 57, H // 8, W // 8)
    assert net.blob_shape("resized_map") == (1, 57, H, W)
    assert net.blob_shape("joints") == (1, 18, 65, 3)
    x = np.random.RandomState(6).rand(1, 3, H, W).astype(np.float32) - 0.5
    out = net.forward(x is None and {} or {"image": x}, outputs=["resized_map", "joints"])
    assert out["resized_map"].shape == (1, 57, H, W)
    assert out["joints"].shape == (1, 18, 65, 3)


@pytest.mark.skipif(not os.path.exists(REF_COCO), reason="reference not mounted")
def test_coco_multiscale_input():
    """Multi-scale: batch dim = num_scales, ImResize averages to batch 1."""
    H, W = 48, 48
    net = Net(
        REF_COCO,
        input_shapes={"image": (2, 3, H, W)},
        overrides={"resize": {"imresize_param.scale_gap": 0.3, "imresize_param.start_scale": 1.0}},
    )
    assert net.blob_shape("resized_map") == (1, 57, H, W)
    x = np.random.RandomState(7).rand(2, 3, H, W).astype(np.float32) - 0.5
    out = net.forward(image=x, outputs=["joints"])
    assert out["joints"].shape == (1, 18, 65, 3)


def test_nms_knob_threshold():
    text = """
    input: "h" input_dim: 1 input_dim: 2 input_dim: 16 input_dim: 16
    layer { name: "nms" type: "Nms" bottom: "h" top: "j"
            nms_param { threshold: 0.9 max_peaks: 4 num_parts: 2 } }
    """
    net = Net(text)
    h = np.zeros((1, 2, 16, 16), np.float32)
    h[0, 0, 8, 8] = 0.5
    out_default = net.forward(h=h)["j"]
    assert out_default[0, 0, 0, 0] == 0  # below static threshold 0.9
    out_knob = net.forward(h=h, knobs={"nms_threshold": 0.3})["j"]
    assert out_knob[0, 0, 0, 0] == 1


class TestAllShippedPrototxtsBuild:
    """Every deploy prototxt the reference ships must build and shape-infer
    (SURVEY.md section 2d model inventory: COCO, MPI + variants, orp)."""

    def test_every_reference_deploy_builds(self):
        import glob as _glob
        import os as _os

        import pytest as _pytest

        from caffe_rtpose_tpu.core.net import Net

        protos = sorted(_glob.glob("/root/reference/model/**/pose_deploy*.prototxt",
                                   recursive=True))
        if not protos:
            _pytest.skip("reference not mounted")
        built = 0
        for p in protos:
            net = Net(p, phase="TEST",
                      input_shapes={"image": (1, 3, 64, 64)})
            assert net.impls, p
            built += 1
        assert built == len(protos)


class TestInsertSplits:
    def test_fanout_rewired_through_split(self):
        from caffe_rtpose_tpu.core.insert_splits import insert_splits
        from caffe_rtpose_tpu.core.net import Net

        proto = {
            "name": "fan",
            "input": ["x"],
            "input_shape": [{"dim": [1, 4]}],
            "layer": [
                {"name": "a", "type": "ReLU", "bottom": ["x"], "top": ["h"]},
                {"name": "u", "type": "AbsVal", "bottom": ["h"], "top": ["u"]},
                {"name": "v", "type": "TanH", "bottom": ["h"], "top": ["v"]},
                {"name": "e", "type": "Eltwise", "bottom": ["u", "v"], "top": ["o"]},
            ],
        }
        sp = insert_splits(proto)
        types = [l["type"] for l in sp["layer"]]
        assert types == ["ReLU", "Split", "AbsVal", "TanH", "Eltwise"]
        split = sp["layer"][1]
        # reference naming: <blob>_<layer>_<topidx>_split[_k]
        assert split["name"] == "h_a_0_split"
        assert split["top"] == ["h_a_0_split_0", "h_a_0_split_1"]
        assert sp["layer"][2]["bottom"] == ["h_a_0_split_0"]
        assert sp["layer"][3]["bottom"] == ["h_a_0_split_1"]
        # the rewritten net still builds and runs identically
        import numpy as np

        x = np.random.RandomState(0).randn(1, 4).astype(np.float32)
        y1 = Net(proto, phase="TEST").forward({"x": x})["o"]
        y2 = Net(sp, phase="TEST").forward({"x": x})["o"]
        np.testing.assert_allclose(y1, y2, rtol=1e-6)

    def test_loss_weight_moves_to_split(self):
        from caffe_rtpose_tpu.core.insert_splits import insert_splits

        proto = {
            "name": "lw",
            "input": ["x"],
            "input_shape": [{"dim": [1, 4]}],
            "layer": [
                {"name": "a", "type": "ReLU", "bottom": ["x"], "top": ["h"],
                 "loss_weight": [2.5]},
                {"name": "u", "type": "AbsVal", "bottom": ["h"], "top": ["u"]},
            ],
        }
        sp = insert_splits(proto)
        split = next(l for l in sp["layer"] if l["type"] == "Split")
        assert split["loss_weight"] == [2.5, 0.0]
        assert "loss_weight" not in sp["layer"][0]


def test_caffenet_builds_and_trains_one_step():
    """BVLC reference CaffeNet regenerated for the framework-level training
    benchmark (reference docs/performance_hardware.md:18); grouped convs,
    LRN, dropout, softmax loss all in one classic topology."""
    import numpy as np

    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.models.caffenet import make_caffenet
    from caffe_rtpose_tpu.training.solver import Solver

    net = Net(make_caffenet(batch=2, crop=67, num_classes=10),
              phase="TRAIN", seed=0)
    rs = np.random.RandomState(0)
    feed = {"data": rs.rand(2, 3, 67, 67).astype(np.float32) * 255,
            "label": np.array([3.0, 5.0], np.float32)}
    l0 = float(net.forward(feed)["loss"])
    assert abs(l0 - np.log(10)) < 1.0  # ~uniform logits at init

    solver = Solver({"base_lr": 0.001, "momentum": 0.9,
                     "lr_policy": "fixed", "max_iter": 3, "display": 0},
                    net, lambda it: feed)
    solver.step(3)
    assert np.isfinite(solver.smoothed_loss)


def test_inplace_after_fanout_superset_semantics():
    """An in-place layer whose bottom has other consumers is FATAL in the
    reference (InsertSplits leaves its top colliding -> 'produced by
    multiple sources', net.cpp AppendTop).  This runtime's functional SSA
    build gives it well-defined semantics instead: earlier consumers see
    the pre-in-place value, later ones the post-in-place value.  A
    documented superset (README divergences)."""
    import numpy as np

    from caffe_rtpose_tpu.core.net import Net

    proto = """
name: "ill" input: "x" input_shape { dim: 1 dim: 1 dim: 2 dim: 2 }
layer { name: "p1" type: "Power" bottom: "x" top: "p1"
  power_param { scale: 2.0 } }
layer { name: "e" type: "Eltwise" bottom: "p1" bottom: "x" top: "e" }
layer { name: "neg" type: "Power" bottom: "p1" top: "p1"
  power_param { scale: -1.0 } }
layer { name: "out" type: "AbsVal" bottom: "p1" top: "out" }
"""
    net = Net(proto, phase="TEST")
    x = np.full((1, 1, 2, 2), 3.0, np.float32)
    o = net.forward({"x": x})
    np.testing.assert_allclose(o["e"], 9.0)   # pre-in-place p1 (=6) + x
    np.testing.assert_allclose(o["out"], 6.0)  # |-(2x)|


def test_netparameter_state_field_filters():
    """NetParameter.state supplies default stages/level (net.cpp
    constructor: file state first, caller stages append, nonzero caller
    level overrides)."""
    from caffe_rtpose_tpu.core.net import Net

    proto = """
name: "st"
state { stage: "A" level: 1 }
input: "x" input_shape { dim: 1 dim: 1 dim: 2 dim: 2 }
layer { name: "a" type: "ReLU" bottom: "x" top: "a"
  include { stage: "A" } }
layer { name: "b" type: "ReLU" bottom: "x" top: "b"
  include { stage: "B" } }
layer { name: "l1" type: "ReLU" bottom: "x" top: "l1"
  include { min_level: 1 } }
layer { name: "l2" type: "ReLU" bottom: "x" top: "l2"
  include { min_level: 2 } }
"""
    net = Net(proto, phase="TEST")
    assert set(net.blob_infos) == {"x", "a", "l1"}
    # caller stages append; nonzero caller level overrides
    net2 = Net(proto, phase="TEST", stages=["B"], level=2)
    assert set(net2.blob_infos) == {"x", "a", "b", "l1", "l2"}


def test_every_reference_layer_type_registered():
    """Living completeness guarantee: every REGISTER_LAYER_CLASS/CREATOR
    name in the mounted reference sources has a builder here."""
    import glob
    import re

    ref = "/root/reference/src/caffe"
    if not os.path.isdir(ref):
        import pytest

        pytest.skip("reference not mounted")
    names = set()
    for path in glob.glob(f"{ref}/**/*.cpp", recursive=True):
        names.update(re.findall(
            r"REGISTER_LAYER_(?:CLASS|CREATOR)\((\w+)", open(path).read()))
    from caffe_rtpose_tpu.core import layers_extra  # noqa: F401
    from caffe_rtpose_tpu.core.data_layers import DATA_LAYER_TYPES
    from caffe_rtpose_tpu.core.layers import REGISTRY

    ours = set(REGISTRY) | set(DATA_LAYER_TYPES)
    assert len(names) >= 60  # the sweep actually found the registry
    assert names <= ours, f"missing builders: {sorted(names - ours)}"
