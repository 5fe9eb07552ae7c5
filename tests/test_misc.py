"""Coverage for the long tail: all shipped prototxt variants build, Switch
layer, CLAHE/putVecPeaks, spatial sharding dryrun, Timer, upgrade tools."""

import glob
import os

import numpy as np
import pytest

from caffe_rtpose_tpu.core.net import Net

REF_MODELS = sorted(
    glob.glob("/root/reference/model/mpi/*.prototxt")
    + glob.glob("/root/reference/model/orp/*/*.prototxt")
)


@pytest.mark.skipif(not REF_MODELS, reason="reference not mounted")
@pytest.mark.parametrize("path", REF_MODELS, ids=[os.path.basename(p) for p in REF_MODELS])
def test_all_shipped_variants_build(path):
    net = Net(path, input_shapes={"image": (1, 3, 64, 64)})
    assert len(net.impls) > 0


def test_switch_layer_knob():
    text = """
    input: "a" input_dim: 1 input_dim: 2 input_dim: 4 input_dim: 4
    layer { name: "p1" type: "Power" bottom: "a" top: "s1" power_param { scale: 1.0 } }
    layer { name: "p2" type: "Power" bottom: "a" top: "s2" power_param { scale: 2.0 } }
    layer { name: "sw" type: "Switch" bottom: "s1" bottom: "s2" top: "y" }
    """
    net = Net(text)
    x = np.ones((1, 2, 4, 4), np.float32)
    np.testing.assert_allclose(net.forward(a=x)["y"], 2 * x)  # default: last
    np.testing.assert_allclose(net.forward(a=x, knobs={"switch_index": 0})["y"], x)
    np.testing.assert_allclose(net.forward(a=x, knobs={"switch_index": 1})["y"], 2 * x)


def test_clahe_and_vec_peaks():
    cv2 = pytest.importorskip("cv2")
    from caffe_rtpose_tpu.training.transformer import clahe, put_vec_peaks

    rs = np.random.RandomState(0)
    img = (rs.rand(64, 64, 3) * 120).astype(np.uint8)
    out = clahe(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # contrast changed

    ex = np.zeros((46, 46), np.float32)
    ey = np.zeros((46, 46), np.float32)
    put_vec_peaks(ex, ey, np.array([80.0, 100.0]), np.array([240.0, 100.0]))
    # stamps at A (x=10), mid (x=20), B (x=30) in grid coords
    assert ex[12, 10] == pytest.approx(1.0)
    assert ex[12, 20] == pytest.approx(1.0)
    assert ex[12, 30] == pytest.approx(1.0)
    assert ex[12, 15] == 0.0  # between discs


def test_dryrun_spatial():
    from caffe_rtpose_tpu.parallel.sp import dryrun_spatial

    dryrun_spatial(4)


def test_timer():
    import time

    from caffe_rtpose_tpu.utils.timer import CPUTimer, Timer

    t = CPUTimer().start()
    time.sleep(0.01)
    t.stop()
    assert 5 <= t.milli_seconds() <= 200
    assert t.has_run_at_least_once

    import jax.numpy as jnp

    dt = Timer().start()
    x = jnp.ones((100, 100)) * 2
    dt.stop(x)
    assert dt.seconds() >= 0


def test_upgrade_tools(tmp_path):
    from caffe_rtpose_tpu.proto import caffe_pb, caffemodel, prototxt, wire
    from caffe_rtpose_tpu.tools.upgrade_proto import main

    # legacy V1 binary net
    net = {"name": "old", "layers": [
        {"name": "ip", "type": caffe_pb.V1_LAYER_TYPE["INNER_PRODUCT"],
         "blobs": [caffemodel.array_to_blob(np.ones((2, 2), np.float32))]}]}
    src = str(tmp_path / "old.caffemodel")
    with open(src, "wb") as f:
        f.write(wire.encode(net, caffe_pb.SCHEMA, "NetParameter"))
    dst = str(tmp_path / "new.caffemodel")
    assert main(["net_binary", src, dst]) == 0
    up = caffemodel.load_net_parameter(dst)
    assert up["layer"][0]["type"] == "InnerProduct"

    # legacy solver with enum type
    sp = str(tmp_path / "solver.prototxt")
    with open(sp, "w") as f:
        f.write("base_lr: 0.1\nlr_policy: 'fixed'\nsolver_type: ADAM\n")
    out = str(tmp_path / "solver_new.prototxt")
    assert main(["solver_text", sp, out]) == 0
    v = caffe_pb.view(prototxt.parse_file(out, "SolverParameter"), "SolverParameter")
    assert v.type == "Adam"
