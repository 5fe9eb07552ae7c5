"""Proto subsystem tests: prototxt text parsing, wire round-trips, and parsing
the shipped reference deploy prototxts (read-only fixtures)."""

import os

import numpy as np
import pytest

from caffe_rtpose_tpu.proto import caffe_pb, caffemodel, prototxt, wire

REF_COCO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"
REF_MPI = "/root/reference/model/mpi/pose_deploy_linevec.prototxt"


def test_parse_simple_net():
    text = """
    name: "tiny"
    input: "data"
    input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
    layer {
      name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
      convolution_param { num_output: 4 pad: 1 kernel_size: 3 stride: 2 }
    }
    layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
    """
    msg = prototxt.parse(text)
    v = caffe_pb.view(msg, "NetParameter")
    assert v.name == "tiny"
    assert list(v.input) == ["data"]
    assert list(v.input_dim) == [1, 3, 8, 8]
    assert len(v.layer) == 2
    conv = v.layer[0]
    assert conv.type == "Convolution"
    cp = conv.convolution_param
    assert cp.num_output == 4
    assert list(cp.pad) == [1]
    assert list(cp.kernel_size) == [3]
    assert list(cp.stride) == [2]
    # defaults
    assert cp.group == 1
    assert cp.bias_term is True


def test_parse_comments_enums_strings():
    text = """
    # a comment
    layer {
      name: "pool" type: "Pooling" bottom: "a" top: "b"
      include { phase: TEST }
      pooling_param { pool: MAX kernel_size: 2 stride: 2 }  # trailing
    }
    """
    msg = prototxt.parse(text)
    layer = caffe_pb.view(msg, "NetParameter").layer[0]
    assert layer.include[0].phase == caffe_pb.PHASE["TEST"]
    assert layer.pooling_param.pool == caffe_pb.POOL_METHOD["MAX"]


@pytest.mark.parametrize("path,n_conv,n_relu", [(REF_COCO, 92, 80), (REF_MPI, 92, 80)])
def test_parse_reference_deploy(path, n_conv, n_relu):
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    msg = prototxt.parse_file(path)
    v = caffe_pb.view(msg, "NetParameter")
    types = [caffe_pb.view(l, "LayerParameter").type for l in msg["layer"]]
    assert types.count("Convolution") == n_conv
    assert types.count("ReLU") == n_relu
    assert types.count("ImResize") == 1
    assert types.count("Nms") == 1
    nms = [l for l in v.layer if l.type == "Nms"][0]
    assert nms.nms_param.max_peaks == 64 or nms.nms_param.max_peaks == 20
    resize = [l for l in v.layer if l.type == "ImResize"][0]
    assert resize.imresize_param.factor == 8


def test_coco_nms_params():
    if not os.path.exists(REF_COCO):
        pytest.skip("reference not mounted")
    v = caffe_pb.view(prototxt.parse_file(REF_COCO), "NetParameter")
    nms = [l for l in v.layer if l.type == "Nms"][0].nms_param
    assert nms.threshold == pytest.approx(0.05)
    assert nms.max_peaks == 64
    assert nms.num_parts == 18


def test_wire_roundtrip_netparam():
    net = {
        "name": "rt",
        "input": ["image"],
        "input_dim": [1, 3, 16, 16],
        "layer": [
            {
                "name": "c1",
                "type": "Convolution",
                "bottom": ["image"],
                "top": ["c1"],
                "convolution_param": {"num_output": 2, "kernel_size": [3], "pad": [1]},
                "blobs": [caffemodel.array_to_blob(np.arange(54, dtype=np.float32).reshape(2, 3, 3, 3))],
            }
        ],
    }
    buf = wire.encode(net, caffe_pb.SCHEMA, "NetParameter")
    back = wire.decode(buf, caffe_pb.SCHEMA, "NetParameter")
    assert back["name"] == "rt"
    assert list(back["input_dim"]) == [1, 3, 16, 16]
    blob = back["layer"][0]["blobs"][0]
    arr = caffemodel.blob_to_array(blob)
    np.testing.assert_array_equal(arr, np.arange(54, dtype=np.float32).reshape(2, 3, 3, 3))


def test_wire_skips_unknown_fields():
    # encode a NetParameter with an extra unknown field spliced in
    buf = wire.encode({"name": "x"}, caffe_pb.SCHEMA, "NetParameter")
    unknown = wire._encode_varint((999 << 3) | 0) + wire._encode_varint(42)
    back = wire.decode(unknown + buf, caffe_pb.SCHEMA, "NetParameter")
    assert back["name"] == "x"


def test_caffemodel_roundtrip(tmp_path):
    w = np.random.RandomState(0).randn(4, 3, 3, 3).astype(np.float32)
    b = np.zeros(4, np.float32)
    net = {
        "name": "m",
        "layer": [
            {"name": "conv1", "type": "Convolution",
             "blobs": [caffemodel.array_to_blob(w), caffemodel.array_to_blob(b)]},
            {"name": "relu1", "type": "ReLU"},
        ],
    }
    p = str(tmp_path / "m.caffemodel")
    caffemodel.save_net_parameter(net, p)
    weights = caffemodel.load_weights(p)
    assert set(weights) == {"conv1"}
    np.testing.assert_allclose(weights["conv1"][0], w)
    np.testing.assert_allclose(weights["conv1"][1], b)


def test_legacy_v1_upgrade(tmp_path):
    w = np.ones((2, 1, 1, 1), np.float32)
    net = {
        "name": "old",
        "layers": [
            {"name": "ip", "type": caffe_pb.V1_LAYER_TYPE["INNER_PRODUCT"],
             "blobs": [caffemodel.array_to_blob(w)]},
        ],
    }
    p = str(tmp_path / "old.caffemodel")
    with open(p, "wb") as f:
        f.write(wire.encode(net, caffe_pb.SCHEMA, "NetParameter"))
    msg = caffemodel.load_net_parameter(p)
    assert msg["layer"][0]["type"] == "InnerProduct"
    np.testing.assert_array_equal(caffemodel.blob_to_array(msg["layer"][0]["blobs"][0]), w)


def test_prototxt_dump_roundtrip():
    text = """
    name: "t"
    layer {
      name: "c" type: "Convolution" bottom: "x" top: "y"
      convolution_param { num_output: 7 kernel_size: 7 pad: 3 }
    }
    """
    msg = prototxt.parse(text)
    dumped = prototxt.dumps(msg)
    again = prototxt.parse(dumped)
    assert again == msg


def test_solver_prototxt():
    text = """
    net: "train.prototxt"
    base_lr: 0.01
    lr_policy: "step"
    gamma: 0.1
    stepsize: 1000
    momentum: 0.9
    weight_decay: 0.0005
    max_iter: 5000
    snapshot: 100
    snapshot_prefix: "snap"
    solver_mode: GPU
    type: "Adam"
    """
    v = caffe_pb.view(prototxt.parse(text, "SolverParameter"), "SolverParameter")
    assert v.base_lr == pytest.approx(0.01)
    assert v.lr_policy == "step"
    assert v.type == "Adam"
    assert v.solver_mode == caffe_pb.SOLVER_MODE["GPU"]
    # default
    assert v.iter_size == 1
