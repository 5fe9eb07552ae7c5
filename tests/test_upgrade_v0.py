"""V0->V1->V2 NetParameter upgrade chain (proto/upgrade.py), mirroring
reference upgrade_proto.cpp:20-651: padding-layer dissolution, per-type V0
param routing, data-transform hoisting, V1 ParamSpec merge, input-field
upgrade.  VERDICT r1 Missing #3 / Next #4."""

import numpy as np

from caffe_rtpose_tpu.core.net import Net
from caffe_rtpose_tpu.proto import caffe_pb, prototxt, wire
from caffe_rtpose_tpu.proto.caffemodel import (
    load_net_parameter, save_net_parameter)
from caffe_rtpose_tpu.proto.upgrade import (
    net_needs_v0_upgrade, upgrade_net_as_needed, upgrade_net_input,
    upgrade_v0_net)

V0_PROTOTXT = """
name: "v0_net"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 16 input_dim: 16
layers {
  layer { name: "pad1" type: "padding" pad: 2 }
  bottom: "data" top: "pad1"
}
layers {
  layer {
    name: "conv1" type: "conv" num_output: 4 kernelsize: 5 stride: 1
    group: 1 biasterm: true
    weight_filler { type: "gaussian" std: 0.1 }
    blobs_lr: 1.0 blobs_lr: 2.0 weight_decay: 1.0 weight_decay: 0.0
  }
  bottom: "pad1" top: "conv1"
}
layers { layer { name: "relu1" type: "relu" } bottom: "conv1" top: "conv1" }
layers {
  layer { name: "pool1" type: "pool" pool: AVE kernelsize: 2 stride: 2 }
  bottom: "conv1" top: "pool1"
}
layers {
  layer { name: "norm1" type: "lrn" local_size: 3 alpha: 2.0 beta: 0.5 }
  bottom: "pool1" top: "norm1"
}
layers {
  layer { name: "drop1" type: "dropout" dropout_ratio: 0.3 }
  bottom: "norm1" top: "norm1"
}
layers {
  layer { name: "fc1" type: "innerproduct" num_output: 7 biasterm: false
          weight_filler { type: "constant" value: 0.01 } }
  bottom: "norm1" top: "fc1"
}
layers { layer { name: "prob" type: "softmax" } bottom: "fc1" top: "prob" }
"""


def test_v0_prototxt_upgrades_and_forwards():
    msg = prototxt.parse(V0_PROTOTXT)
    assert net_needs_v0_upgrade(msg)
    up = upgrade_net_as_needed(msg)
    names = [l["name"] for l in up["layer"]]
    assert "pad1" not in names  # padding layer dissolved (:131-189)
    conv = up["layer"][names.index("conv1")]
    assert conv["type"] == "Convolution"
    # pad pushed into conv + bottom rewired to the padding layer's input
    assert conv["convolution_param"]["pad"] == [2]
    assert conv["bottom"] == ["data"]
    assert conv["convolution_param"]["num_output"] == 4
    assert conv["convolution_param"]["kernel_size"] == [5]
    assert conv["convolution_param"]["weight_filler"]["std"] == \
        np.float32(0.1)
    # blobs_lr/weight_decay -> positional ParamSpec (:727-735)
    assert conv["param"] == [{"lr_mult": 1.0, "decay_mult": 1.0},
                             {"lr_mult": 2.0, "decay_mult": 0.0}]
    pool = up["layer"][names.index("pool1")]
    assert pool["type"] == "Pooling"
    assert pool["pooling_param"]["pool"] == caffe_pb.POOL_METHOD["AVE"]
    assert pool["pooling_param"]["kernel_size"] == 2  # scalar for pool
    lrn = up["layer"][names.index("norm1")]
    assert lrn["lrn_param"] == {"local_size": 3, "alpha": 2.0, "beta": 0.5}
    drop = up["layer"][names.index("drop1")]
    assert drop["dropout_param"]["dropout_ratio"] == np.float32(0.3)
    fc = up["layer"][names.index("fc1")]
    assert fc["type"] == "InnerProduct"
    assert fc["inner_product_param"]["bias_term"] is False

    # ...and the upgraded net builds and forwards (TEST phase)
    net = Net(up, phase="TEST")
    out = net.forward(data=np.random.RandomState(0)
                      .randn(1, 3, 16, 16).astype(np.float32))
    assert out["prob"].shape == (1, 7)
    np.testing.assert_allclose(np.asarray(out["prob"]).sum(), 1.0, rtol=1e-5)


def test_v0_net_builds_directly():
    """Net() runs the upgrade chain itself on legacy input."""
    net = Net(V0_PROTOTXT, phase="TEST")
    out = net.forward(data=np.zeros((1, 3, 16, 16), np.float32))
    assert out["prob"].shape == (1, 7)


def test_v0_binary_roundtrip(tmp_path):
    """Binary V0 fixture -> load_net_parameter upgrades -> save modern."""
    msg = prototxt.parse(V0_PROTOTXT)
    raw = wire.encode(msg, caffe_pb.SCHEMA, "NetParameter")
    p = tmp_path / "v0.caffemodel"
    p.write_bytes(raw)
    up = load_net_parameter(str(p))
    assert "layers" not in up and len(up["layer"]) == 7
    out_p = tmp_path / "v2.caffemodel"
    save_net_parameter(up, str(out_p))
    again = load_net_parameter(str(out_p))
    assert [l["name"] for l in again["layer"]] == \
        [l["name"] for l in up["layer"]]


def test_v0_data_layer_transform_routing():
    txt = """
    layers {
      layer { name: "d" type: "data" source: "db" batchsize: 8
              scale: 0.00390625 meanfile: "m.binaryproto"
              cropsize: 12 mirror: true rand_skip: 5 }
      top: "data" top: "label"
    }
    """
    up = upgrade_v0_net(prototxt.parse(txt))
    l = up["layers"][0]
    assert l["data_param"] == {"source": "db", "batch_size": 8,
                               "rand_skip": 5}
    tp = l["transform_param"]
    assert tp["mean_file"] == "m.binaryproto"
    assert tp["crop_size"] == 12 and tp["mirror"] is True
    assert abs(tp["scale"] - 0.00390625) < 1e-9


def test_v1_data_transform_upgrade():
    """NetNeedsDataUpgrade path: V1 net with transform fields inside
    data_param gets them hoisted (:599-651)."""
    msg = {"layers": [{
        "name": "d", "type": caffe_pb.V1_LAYER_TYPE["DATA"],
        "top": ["data"],
        "data_param": {"source": "db", "batch_size": 4, "scale": 0.5,
                       "crop_size": 10},
    }]}
    up = upgrade_net_as_needed(msg)
    l = up["layer"][0]
    assert l["type"] == "Data"
    assert l["data_param"] == {"source": "db", "batch_size": 4}
    assert l["transform_param"] == {"scale": 0.5, "crop_size": 10}


def test_input_field_upgrade():
    msg = prototxt.parse(V0_PROTOTXT)
    up = upgrade_net_as_needed(msg, upgrade_input=True)
    first = up["layer"][0]
    assert first["type"] == "Input" and first["top"] == ["data"]
    assert first["input_param"]["shape"] == [{"dim": [1, 3, 16, 16]}]
    assert "input" not in up and "input_dim" not in up
    # upgraded-to-Input form builds identically
    net = Net(up, phase="TEST")
    out = net.forward(data=np.zeros((1, 3, 16, 16), np.float32))
    assert out["prob"].shape == (1, 7)


def test_upgrade_tool_cli(tmp_path):
    from caffe_rtpose_tpu.tools.upgrade_proto import main

    src = tmp_path / "v0.prototxt"
    src.write_text(V0_PROTOTXT)
    dst = tmp_path / "v2.prototxt"
    assert main(["net_text", str(src), str(dst)]) == 0
    up = prototxt.parse_file(str(dst))
    assert "layers" not in up
    assert up["layer"][0]["type"] == "Input"
    net = Net(up, phase="TEST")
    out = net.forward(data=np.zeros((1, 3, 16, 16), np.float32))
    assert out["prob"].shape == (1, 7)
