"""Solver result display + blobs-after-step parity.

Reference behaviors covered:
- solver.cpp:243-277 — per-display ``Train net output #k: name = value
  (* w = contribution loss)`` lines from net_->output_blobs() after the
  training Forward, plus the ``Iteration N, lr = rate`` line
  (sgd_solver.cpp GetLearningRate logging).
- pycaffe idiom: ``solver.step(1); solver.net.blobs['loss'].data`` reads
  the last training forward's values (blobs alias shared memory in the
  reference; here they ride the jitted step's aux channel).
"""

import numpy as np
import pytest

from caffe_rtpose_tpu import api as caffe
from caffe_rtpose_tpu.tools import caffe_tool

_NET = """
name: "t"
input: "x" input_shape { dim: 4 dim: 3 }
input: "t" input_shape { dim: 4 dim: 1 }
layer { name: "ip" type: "InnerProduct" bottom: "x" top: "p"
  inner_product_param { num_output: 1
    weight_filler { type: "gaussian" std: 0.3 } } }
layer { name: "l" type: "EuclideanLoss" bottom: "p" bottom: "t" top: "l" }
"""

_SELF_FEED_NET = """
name: "t"
layer { name: "data" type: "DummyData" top: "x" top: "t"
  dummy_data_param { shape { dim: 4 dim: 3 } shape { dim: 4 dim: 1 }
    data_filler { type: "gaussian" std: 1.0 }
    data_filler { type: "constant" value: 0.5 } } }
layer { name: "ip" type: "InnerProduct" bottom: "x" top: "p"
  inner_product_param { num_output: 1
    weight_filler { type: "gaussian" std: 0.3 } } }
layer { name: "l" type: "EuclideanLoss" bottom: "p" bottom: "t" top: "l" }
"""


def _data_fn(seed=0):
    rs = np.random.RandomState(seed)
    W = np.array([[1.0, -2.0, 0.5]], np.float32)

    def fn(it):
        x = rs.randn(4, 3).astype(np.float32)
        return {"x": x, "t": x @ W.T}

    return fn


def test_blobs_alias_last_training_forward(tmp_path):
    net = tmp_path / "n.prototxt"
    net.write_text(_NET)
    sol = tmp_path / "s.prototxt"
    sol.write_text(f'net: "{net}"\nbase_lr: 0.1\nlr_policy: "fixed"\n'
                   'max_iter: 10\n')
    s = caffe.SGDSolver(str(sol), data_fn=_data_fn())
    ret = s.step(1)
    # the loss output blob shows the training forward's value, without an
    # intervening net.forward()
    assert float(s.net.blobs["l"].data) == pytest.approx(ret, rel=1e-6)
    ret2 = s.step(1)
    assert ret2 != ret
    assert float(s.net.blobs["l"].data) == pytest.approx(ret2, rel=1e-6)


def test_train_outputs_and_display(tmp_path, capsys):
    net = tmp_path / "n.prototxt"
    net.write_text(_NET)
    sol = tmp_path / "s.prototxt"
    sol.write_text(f'net: "{net}"\nbase_lr: 0.1\nlr_policy: "fixed"\n'
                   'max_iter: 10\n')
    s = caffe.SGDSolver(str(sol), data_fn=_data_fn())
    ret = s.step(1)
    outs = s._solver.train_outputs()
    assert set(outs) == {"l"}
    assert float(outs["l"]) == pytest.approx(ret, rel=1e-6)
    s._solver.display_outputs()
    line = capsys.readouterr().out.rstrip()
    assert line.startswith("    Train net output #0: l = ")
    assert "loss)" in line  # the (* w = x loss) suffix for weighted tops


def test_cli_train_display_lines(tmp_path, capsys):
    """`caffe train` prints the reference's result + lr display lines, and
    a fully self-feeding graph (DummyData) trains with no --data source."""
    net = tmp_path / "n.prototxt"
    net.write_text(_SELF_FEED_NET)
    sol = tmp_path / "s.prototxt"
    sol.write_text(f'net: "{net}"\nbase_lr: 0.05\nlr_policy: "step"\n'
                   'stepsize: 2\ngamma: 0.5\nmax_iter: 4\ndisplay: 2\n')
    assert caffe_tool.main(["train", "--solver", str(sol)]) == 0
    out = capsys.readouterr().out
    assert "Train net output #0: l = " in out
    assert "Iteration 2, lr = 0.025" in out
    assert "Iteration 4, lr = 0.0125" in out


_PHASE_INPUT_NET = """
name: "t"
input: "x" input_shape { dim: 4 dim: 3 }
input: "t" input_shape { dim: 4 dim: 1 }
input: "probe" input_shape { dim: 4 dim: 1 }
layer { name: "ip" type: "InnerProduct" bottom: "x" top: "p"
  inner_product_param { num_output: 1
    weight_filler { type: "gaussian" std: 0.3 } } }
layer { name: "l" type: "EuclideanLoss" bottom: "p" bottom: "t" top: "l" }
layer { name: "probe_sink" type: "Silence" bottom: "probe"
  include { phase: TEST } }
"""


def test_unfed_phase_excluded_input_does_not_break_step(tmp_path):
    """A declared input consumed only by a TEST-phase layer is unconsumed
    in TRAIN; with_outputs must skip it rather than KeyError at trace
    time (core/net.py make_loss_fn)."""
    net = tmp_path / "n.prototxt"
    net.write_text(_PHASE_INPUT_NET)
    sol = tmp_path / "s.prototxt"
    sol.write_text(f'net: "{net}"\nbase_lr: 0.1\nlr_policy: "fixed"\n'
                   'max_iter: 4\n')
    s = caffe.SGDSolver(str(sol), data_fn=_data_fn())
    s.step(2)  # would raise KeyError("probe") before the fix
    assert np.isfinite(s.net.blobs["l"].data).all()


def test_output_names_order_deterministic():
    """Train-output numbering follows production order (reference blob-id
    order), not Python set order."""
    from caffe_rtpose_tpu.core.net import Net

    layers = [{"name": f"s{i}", "type": "Split", "bottom": ["x"],
               "top": [f"out_{c}"]} for i, c in enumerate("zebra")]
    net = Net({"input": ["x"], "input_shape": [{"dim": [1, 2]}],
               "layer": layers}, phase="TEST", seed=0)
    assert net.output_names() == [f"out_{c}" for c in "zebra"]


def test_step_output_fetch_is_lazy(tmp_path, monkeypatch):
    """solver.step() must not device_get the train outputs eagerly — the
    pull happens on first facade blob read (api._sync_facades)."""
    net = tmp_path / "n.prototxt"
    net.write_text(_NET)
    sol = tmp_path / "s.prototxt"
    sol.write_text(f'net: "{net}"\nbase_lr: 0.1\nlr_policy: "fixed"\n'
                   'max_iter: 10\n')
    s = caffe.SGDSolver(str(sol), data_fn=_data_fn())
    calls = []
    inner = s._solver
    orig = type(inner).train_outputs

    def counting(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(type(inner), "train_outputs", counting)
    s.step(3)
    assert not calls  # no eager fetch during stepping
    val = s.net.blobs["l"].data
    assert np.isfinite(val).all()
    assert len(calls) == 1  # one shared pull on first read
