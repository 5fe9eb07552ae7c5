"""The generated ``caffe_pb2`` pycaffe-compat surface: real protobuf
classes (proto/gen_proto.py emits the schema registry as .proto; protoc
compiles it) interoperating bit-for-bit with the framework's own wire and
text codecs."""

import os
import shutil

import numpy as np
import pytest

if shutil.which("protoc") is None:
    pytest.skip("protoc not available", allow_module_level=True)
pytest.importorskip("google.protobuf")

from caffe_rtpose_tpu.proto import caffe_pb2, prototxt, wire
from caffe_rtpose_tpu.proto.caffe_pb import SCHEMA

COCO_DEPLOY = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


def test_text_format_parses_coco_deploy():
    if not os.path.exists(COCO_DEPLOY):
        pytest.skip("reference not mounted")
    from google.protobuf import text_format

    net = caffe_pb2.NetParameter()
    text_format.Merge(open(COCO_DEPLOY).read(), net)
    ours = prototxt.parse_file(COCO_DEPLOY)
    assert len(net.layer) == len(ours["layer"]) == 183
    assert net.layer[0].type == ours["layer"][0]["type"]
    # CPM extension fields ride along
    nms = [l for l in net.layer if l.type == "Nms"][0]
    assert nms.nms_param.num_parts == 18
    assert [d for d in net.input_dim] == ours["input_dim"]


def test_enum_defaults_and_symbols():
    assert caffe_pb2.PoolingParameter().pool == caffe_pb2.PoolingParameter.MAX
    assert caffe_pb2.EltwiseParameter().operation == \
        caffe_pb2.EltwiseParameter.SUM
    assert caffe_pb2.SolverParameter().snapshot_format == \
        caffe_pb2.SolverParameter.BINARYPROTO
    assert caffe_pb2.LRNParameter().norm_region == \
        caffe_pb2.LRNParameter.ACROSS_CHANNELS


def test_wire_interop_with_native_codec():
    """google-protobuf-serialized bytes decode through proto/wire.py and
    vice versa."""
    msg = caffe_pb2.NetParameter()
    msg.name = "interop"
    lay = msg.layer.add()
    lay.name = "c1"
    lay.type = "Convolution"
    lay.bottom.append("data")
    lay.top.append("c1")
    lay.convolution_param.num_output = 4
    lay.convolution_param.kernel_size.append(3)
    lay.convolution_param.weight_filler.type = "gaussian"
    lay.convolution_param.weight_filler.std = 0.05
    blob = lay.blobs.add()
    blob.shape.dim.extend([4, 3, 3, 3])
    blob.data.extend(np.arange(108, dtype=np.float32).tolist())

    dec = wire.decode(msg.SerializeToString(), SCHEMA, "NetParameter")
    assert dec["name"] == "interop"
    assert dec["layer"][0]["convolution_param"]["kernel_size"] == [3]
    assert dec["layer"][0]["blobs"][0]["data"][:3] == [0.0, 1.0, 2.0]

    rt = caffe_pb2.NetParameter()
    rt.ParseFromString(wire.encode(dec, SCHEMA, "NetParameter"))
    assert rt.layer[0].convolution_param.weight_filler.std == \
        pytest.approx(0.05)
    assert list(rt.layer[0].blobs[0].shape.dim) == [4, 3, 3, 3]


def test_caffemodel_save_parses_with_pb2(tmp_path):
    """A .caffemodel written by the framework loads through the generated
    classes (what a reference-pycaffe user's tooling would do)."""
    from caffe_rtpose_tpu.core.net import Net

    proto = tmp_path / "tiny.prototxt"
    proto.write_text("""
name: "tiny"
input: "x" input_shape { dim: 1 dim: 2 dim: 4 dim: 4 }
layer { name: "c" type: "Convolution" bottom: "x" top: "y"
  convolution_param { num_output: 3 kernel_size: 3
    weight_filler { type: "xavier" } } }
""")
    net = Net(str(proto), phase="TEST")
    path = tmp_path / "tiny.caffemodel"
    net.save_caffemodel(str(path))

    msg = caffe_pb2.NetParameter()
    msg.ParseFromString(path.read_bytes())
    conv = [l for l in msg.layer if l.name == "c"][0]
    assert list(conv.blobs[0].shape.dim) == [3, 2, 3, 3]
    assert len(conv.blobs[0].data) == 3 * 2 * 3 * 3
