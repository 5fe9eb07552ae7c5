"""CLI tool tests: train/test/time/device_query round trips, aux tools,
signal handler, and NetSpec."""

import os
import signal
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

TRAIN_NET = """
name: "lsq"
input: "x" input_shape { dim: 8 dim: 3 }
input: "y" input_shape { dim: 8 dim: 1 }
layer { name: "fc" type: "InnerProduct" bottom: "x" top: "pred"
  inner_product_param { num_output: 1 weight_filler { type: "gaussian" std: 0.5 } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "pred" bottom: "y" top: "loss" }
"""


@pytest.fixture
def lsq_files(tmp_path):
    import h5py

    net_path = tmp_path / "net.prototxt"
    net_path.write_text(TRAIN_NET)
    solver_path = tmp_path / "solver.prototxt"
    solver_path.write_text(
        f'net: "{net_path}"\nbase_lr: 0.05\nlr_policy: "fixed"\nmomentum: 0.9\n'
        f'max_iter: 60\ndisplay: 0\nsnapshot_prefix: "{tmp_path}/snap"\n'
    )
    rs = np.random.RandomState(0)
    X = rs.randn(8, 3).astype(np.float32)
    Y = (X @ np.array([[1.0], [2.0], [-1.0]], np.float32)) + 0.5
    h5 = tmp_path / "data.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("x", data=X)
        f.create_dataset("y", data=Y)
    return str(net_path), str(solver_path), str(h5), tmp_path


def test_caffe_train_and_test(lsq_files, capsys):
    from caffe_rtpose_tpu.tools.caffe_tool import main

    net_path, solver_path, h5, tmp = lsq_files
    assert main(["train", "--solver", solver_path, "--data", h5]) == 0
    out = capsys.readouterr().out
    assert "Optimization Done" in out
    # snapshot written by snapshot_after_train
    snaps = [f for f in os.listdir(tmp) if f.endswith(".caffemodel")]
    assert snaps
    # test command with the trained weights
    w = os.path.join(tmp, sorted(snaps)[-1])
    assert main(["test", "--model", net_path, "--weights", w,
                 "--data", h5, "--iterations", "2"]) == 0
    out = capsys.readouterr().out
    assert "loss = " in out or "loss" in out


def test_caffe_time(lsq_files, capsys):
    from caffe_rtpose_tpu.tools.caffe_tool import main

    net_path, _, _, _ = lsq_files
    assert main(["time", "--model", net_path, "--iterations", "2", "--phase", "TRAIN"]) == 0
    out = capsys.readouterr().out
    assert "fc" in out and "forward:" in out and "FUSED" in out


def test_device_query(capsys):
    from caffe_rtpose_tpu.tools.caffe_tool import main

    assert main(["device_query"]) == 0
    assert "platform" in capsys.readouterr().out


def test_signal_handler_snapshot_action():
    from caffe_rtpose_tpu.utils.signals import SignalHandler, SolverAction

    h = SignalHandler()
    assert h.check_for_action() == SolverAction.NONE
    os.kill(os.getpid(), signal.SIGHUP)
    import time

    time.sleep(0.05)
    assert h.check_for_action() == SolverAction.SNAPSHOT
    assert h.check_for_action() == SolverAction.NONE
    h.restore()


def test_aux_tools_roundtrip(tmp_path, capsys):
    from caffe_rtpose_tpu.tools.aux_tools import compute_image_mean, main

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rs = np.random.RandomState(0)
    names = []
    for i in range(4):
        name = f"im{i}.png"
        cv2.imwrite(str(imgdir / name), (rs.rand(10, 12, 3) * 255).astype(np.uint8))
        names.append(name)
    listfile = tmp_path / "list.txt"
    listfile.write_text("".join(f"{n} {i}\n" for i, n in enumerate(names)))
    out_h5 = str(tmp_path / "pack.h5")
    assert main(["convert_imageset", str(listfile), str(imgdir), out_h5,
                 "--resize_height", "8", "--resize_width", "8"]) == 0
    import h5py

    with h5py.File(out_h5) as f:
        assert f["data"].shape == (4, 3, 8, 8)
        assert list(f["label"]) == [0, 1, 2, 3]
    mean = compute_image_mean(out_h5)
    assert mean.shape == (3, 8, 8)


def test_netspec_dsl():
    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.core.net_spec import L, NetSpec

    n = NetSpec("tiny")
    n.data = L.Input(shape=dict(dim=[1, 3, 8, 8]))
    n.conv1 = L.Convolution(n.data, num_output=4, kernel_size=3, pad=1,
                            weight_filler=dict(type="xavier"))
    n.relu1 = L.ReLU(n.conv1, in_place=True)
    n.pool1 = L.Pooling(n.data, pool="MAX", kernel_size=2, stride=2)
    proto = n.to_prototxt()
    assert 'type: "Convolution"' in proto
    net = Net(n.to_proto())
    assert net.blob_shape("conv1") == (1, 4, 8, 8)
    assert net.blob_shape("pool1") == (1, 3, 4, 4)


def test_deprecated_tool_shims(tmp_path, capsys):
    """train_net / test_net / finetune_net / net_speed_benchmark shims
    (reference tools/*.cpp 7-line deprecation wrappers)."""
    import h5py

    from caffe_rtpose_tpu.tools.shims import main as shims

    rs = np.random.RandomState(0)
    X = rs.randn(6, 3).astype(np.float32)
    Y = (X @ np.array([[1.0], [2.0], [-1.0]], np.float32)) + 0.5
    h5 = tmp_path / "d.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("x", data=X)
        f.create_dataset("y", data=Y)
    lst = tmp_path / "d.txt"
    lst.write_text(f"{h5}\n")
    net = tmp_path / "net.prototxt"
    net.write_text(f"""
name: "lsq"
layer {{ name: "data" type: "HDF5Data" top: "x" top: "y"
  hdf5_data_param {{ source: "{lst}" batch_size: 6 }} }}
layer {{ name: "fc" type: "InnerProduct" bottom: "x" top: "pred"
  inner_product_param {{ num_output: 1
    weight_filler {{ type: "gaussian" std: 0.1 }} }} }}
layer {{ name: "loss" type: "EuclideanLoss" bottom: "pred" bottom: "y"
  top: "loss" }}
""")
    solver = tmp_path / "solver.prototxt"
    solver.write_text(f'net: "{net}"\nbase_lr: 0.02\nlr_policy: "fixed"\n'
                      f'momentum: 0.9\nmax_iter: 20\ndisplay: 0\n'
                      f'snapshot_prefix: "{tmp_path}/s"\nsnapshot: 20\n')

    assert shims(["train_net", str(solver)]) == 0
    err = capsys.readouterr().err
    assert "train_net is deprecated" in err
    weights = f"{tmp_path}/s_iter_20.caffemodel"
    assert os.path.exists(weights)

    assert shims(["test_net", str(net), weights, "2"]) == 0
    assert shims(["finetune_net", str(solver), weights]) == 0
    assert shims(["net_speed_benchmark", str(net), "2"]) == 0
    assert "net_speed_benchmark is deprecated" in capsys.readouterr().err
    assert shims(["bogus"]) == 2


def test_classify_detect_draw_clis(tmp_path, capsys):
    """The pycaffe script surface (reference python/classify.py, detect.py,
    draw_net.py) as -m CLIs over api.Classifier/Detector/draw_net_dot."""
    from caffe_rtpose_tpu.tools import classify, detect, draw_net

    proto = tmp_path / "deploy.prototxt"
    proto.write_text("""
name: "tinycls"
input: "data" input_shape { dim: 10 dim: 3 dim: 32 dim: 32 }
layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
  convolution_param { num_output: 8 kernel_size: 5 stride: 2
    weight_filler { type: "xavier" } } }
layer { name: "pool" type: "Pooling" bottom: "conv" top: "pool"
  pooling_param { pool: AVE global_pooling: true } }
layer { name: "prob" type: "Softmax" bottom: "pool" top: "prob" }
""")
    rs = np.random.RandomState(0)
    for i in range(2):
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"),
                    (rs.rand(48, 64, 3) * 255).astype(np.uint8))

    out_npy = tmp_path / "out.npy"
    assert classify.main([str(tmp_path), str(out_npy),
                          "--model_def", str(proto),
                          "--images_dim", "40,40", "--mean_file", ""]) == 0
    preds = np.load(out_npy)
    assert preds.shape == (2, 8)
    np.testing.assert_allclose(preds.sum(1), 1.0, rtol=1e-5)

    win_csv = tmp_path / "win.csv"
    win_csv.write_text(
        "filename, xmin, ymin, xmax, ymax\n"
        f"{tmp_path}/im0.jpg, 2, 3, 40, 40\n"
        f"{tmp_path}/im1.jpg, 0, 0, 30, 30\n")
    det_csv = tmp_path / "det.csv"
    assert detect.main([str(win_csv), str(det_csv),
                        "--model_def", str(proto), "--crop_mode", "list",
                        "--mean_file", ""]) == 0
    lines = det_csv.read_text().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith("filename")

    dot = tmp_path / "net.dot"
    assert draw_net.main([str(proto), str(dot), "--rankdir", "TB"]) == 0
    txt = dot.read_text()
    assert "rankdir=TB" in txt and '"conv"' in txt


def test_caffe_cli_level_stage_flags(tmp_path, capsys):
    """--level/--stage (tools/caffe.cpp:39-43) drive NetState filtering."""
    from caffe_rtpose_tpu.tools.caffe_tool import main

    proto = tmp_path / "staged.prototxt"
    proto.write_text("""
name: "staged"
input: "data" input_shape { dim: 1 dim: 2 dim: 4 dim: 4 }
layer { name: "always" type: "ReLU" bottom: "data" top: "a" }
layer { name: "onlyA" type: "Power" bottom: "a" top: "b"
  power_param { scale: 2.0 } include { stage: "A" } }
""")
    assert main(["time", "--model", str(proto), "--iterations", "1"]) == 0
    out = capsys.readouterr().out
    assert "onlyA" not in out
    assert main(["time", "--model", str(proto), "--iterations", "1",
                 "--stage", "A"]) == 0
    assert "onlyA" in capsys.readouterr().out


def test_solver_train_state_stages(tmp_path, capsys):
    """SolverParameter.train_state merges over the net's own state
    (solver.cpp:99-103)."""
    from caffe_rtpose_tpu.tools.caffe_tool import main

    net = tmp_path / "n.prototxt"
    net.write_text("""
name: "st"
input: "x" input_shape { dim: 2 dim: 3 }
input: "t" input_shape { dim: 2 dim: 2 }
layer { name: "base" type: "InnerProduct" bottom: "x" top: "o"
  inner_product_param { num_output: 2
    weight_filler { type: "xavier" } } }
layer { name: "aux" type: "Power" bottom: "o" top: "aux"
  power_param { scale: 0.0 } include { stage: "trainaux" } }
layer { name: "auxloss" type: "EuclideanLoss" bottom: "aux" bottom: "t"
  top: "auxloss" include { stage: "trainaux" } }
layer { name: "loss" type: "EuclideanLoss" bottom: "o" bottom: "t"
  top: "loss" }
""")
    solver = tmp_path / "s.prototxt"
    solver.write_text(
        f'net: "{net}"\ntrain_state {{ stage: "trainaux" }}\n'
        'base_lr: 0.001\nlr_policy: "fixed"\nmax_iter: 1\ndisplay: 0\n')
    import numpy as np

    np.savez(tmp_path / "d.npz", x=np.zeros((2, 3), np.float32),
             t=np.zeros((2, 2), np.float32))
    assert main(["train", "--solver", str(solver),
                 "--data", str(tmp_path / "d.npz")]) == 0
    # without train_state the stage-gated branch would be filtered; with
    # it the aux loss contributes (total loss includes both heads)


def test_every_reference_cli_flag_accepted():
    """Living flag-surface guarantee: every DEFINE_* flag in the reference
    rtpose.cpp / tools/caffe.cpp maps to an option our CLIs accept."""
    import re

    ref_rt = "/root/reference/examples/rtpose/rtpose.cpp"
    ref_caffe = "/root/reference/tools/caffe.cpp"
    if not os.path.exists(ref_rt):
        pytest.skip("reference not mounted")

    from caffe_rtpose_tpu.tools.caffe_tool import build_parser as caffe_parser
    from caffe_rtpose_tpu.tools.rtpose import build_parser as rt_parser

    def flags(path):
        return set(re.findall(r"DEFINE_\w+\(\s*(\w+)", open(path).read()))

    def options(parser):
        out = set()
        for a in parser._actions:
            for s in a.option_strings:
                out.add(s.lstrip("-"))
        # subparsers too
        for a in parser._actions:
            if hasattr(a, "choices") and isinstance(a.choices, dict):
                for sub in a.choices.values():
                    out |= options(sub)
        return out

    rt_missing = flags(ref_rt) - options(rt_parser())
    assert not rt_missing, f"rtpose flags missing: {sorted(rt_missing)}"
    caffe_missing = flags(ref_caffe) - options(caffe_parser())
    assert not caffe_missing, f"caffe flags missing: {sorted(caffe_missing)}"


CONV_TRAIN_NET = """
input: "x" input_dim: 8 input_dim: 3 input_dim: 16 input_dim: 16
input: "y" input_dim: 8 input_dim: 2 input_dim: 8 input_dim: 8
layer { name: "c1" type: "Convolution" bottom: "x" top: "c1"
  convolution_param { num_output: 4 pad: 1 kernel_size: 3
    weight_filler { type: "msra" } } }
layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
layer { name: "p1" type: "Pooling" bottom: "c1" top: "p1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "c2" type: "Convolution" bottom: "p1" top: "c2"
  convolution_param { num_output: 2 pad: 1 kernel_size: 3
    weight_filler { type: "msra" } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "c2" bottom: "y" top: "loss" }
"""


def test_caffe_train_composed_mesh_matches_single(tmp_path, capsys):
    """`caffe train --gpu all --spatial 2` (composed data x spatial mesh)
    reaches the same weights as the single-device run."""
    import h5py

    from caffe_rtpose_tpu.proto.caffemodel import load_weights
    from caffe_rtpose_tpu.tools.caffe_tool import main

    net_path = tmp_path / "net.prototxt"
    net_path.write_text(CONV_TRAIN_NET)
    rs = np.random.RandomState(0)
    h5 = tmp_path / "data.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("x", data=rs.randn(8, 3, 16, 16).astype(np.float32))
        f.create_dataset("y", data=rs.randn(8, 2, 8, 8).astype(np.float32))

    weights = {}
    for tag, extra in (("single", []), ("mesh2d", ["--gpu", "all", "--spatial", "2"])):
        sp = tmp_path / f"solver_{tag}.prototxt"
        sp.write_text(
            f'net: "{net_path}"\nbase_lr: 0.02\nlr_policy: "fixed"\n'
            f'momentum: 0.9\nmax_iter: 8\ndisplay: 0\nrandom_seed: 11\n'
            f'snapshot_prefix: "{tmp_path}/{tag}"\n')
        assert main(["train", "--solver", str(sp), "--data", str(h5)] + extra) == 0
        weights[tag] = load_weights(f"{tmp_path}/{tag}_iter_8.caffemodel")

    out = capsys.readouterr().out
    assert "Composed mesh training over 8 devices" in out
    single, mesh = weights["single"], weights["mesh2d"]
    assert set(single) == set(mesh)
    for name in single:
        for a, b in zip(single[name], mesh[name]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
