"""parse_log / plot_training_log — the tools/extra analogs.

The parser must handle BOTH this framework's `caffe train` stdout and
reference-style glog-stamped logs (parse_log.py + extract_seconds.py
upstream behaviors: row per display block, Seconds from timestamps,
initial-NaN learning-rate fixup).
"""

import contextlib
import io

import pytest

from caffe_rtpose_tpu.tools import caffe_tool
from caffe_rtpose_tpu.tools.parse_log import main as parse_main, parse_log
from caffe_rtpose_tpu.tools.plot_training_log import extract_series

_NET = """
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

_GLOG_LOG = """\
I0523 14:00:00.000000  1234 solver.cpp:242] Iteration 0, loss = 2.5
I0523 14:00:00.100000  1234 solver.cpp:258]     Train net output #0: l = 2.5 (* 1 = 2.5 loss)
I0523 14:00:00.200000  1234 sgd_solver.cpp:112] Iteration 0, lr = 0.1
I0523 14:00:10.000000  1234 solver.cpp:242] Iteration 20, loss = 1.25
I0523 14:00:10.100000  1234 solver.cpp:258]     Train net output #0: l = 1.25 (* 1 = 1.25 loss)
I0523 14:00:10.200000  1234 sgd_solver.cpp:112] Iteration 20, lr = 0.05
I0523 14:00:15.000000  1234 solver.cpp:330] Iteration 40, Testing net (#0)
I0523 14:00:15.500000  1234 solver.cpp:397]     Test net output #0: accuracy = 0.75
I0523 14:00:15.500000  1234 solver.cpp:397]     Test net output #1: l = 1.0
"""


@pytest.fixture()
def train_log(tmp_path):
    """A real `caffe train` log captured from the CLI."""
    net = tmp_path / "n.prototxt"
    net.write_text(_NET)
    sol = tmp_path / "s.prototxt"
    sol.write_text(f'net: "{net}"\nbase_lr: 0.05\nlr_policy: "step"\n'
                   'stepsize: 2\ngamma: 0.5\nmax_iter: 6\ndisplay: 2\n')
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert caffe_tool.main(["train", "--solver", str(sol)]) == 0
    log = tmp_path / "caffe.log"
    log.write_text(buf.getvalue())
    return log


def test_parse_own_train_log(train_log, tmp_path):
    train_rows, test_rows = parse_log(str(train_log))
    assert [r["NumIters"] for r in train_rows] == [2.0, 4.0, 6.0]
    assert all("l" in r for r in train_rows)
    # lr decays by the step policy and lands in the rows
    assert train_rows[0]["LearningRate"] == pytest.approx(0.025)
    assert train_rows[2]["LearningRate"] == pytest.approx(0.0125)
    assert test_rows == []
    # CSV writer end-to-end
    assert parse_main([str(train_log), str(tmp_path)]) == 0
    train_csv = (tmp_path / "caffe.log.train").read_text().splitlines()
    assert train_csv[0] == "NumIters,Seconds,LearningRate,l"
    assert len(train_csv) == 4


def test_parse_glog_reference_log(tmp_path):
    log = tmp_path / "ref.log"
    log.write_text(_GLOG_LOG)
    train_rows, test_rows = parse_log(str(log))
    assert len(train_rows) == 2
    assert train_rows[1]["Seconds"] == pytest.approx(10.1, abs=1e-6)
    assert train_rows[1]["l"] == 1.25
    assert len(test_rows) == 1
    assert test_rows[0]["NumIters"] == 40.0
    assert test_rows[0]["accuracy"] == 0.75
    assert test_rows[0]["l"] == 1.0


def test_plot_series_selection(tmp_path, train_log):
    # chart 6: train loss vs iters on our own log
    x, y, label = extract_series(str(train_log), 6)
    assert x == [2.0, 4.0, 6.0] and len(y) == 3 and "l" in label
    # chart 0/2 on a glog log: accuracy vs loss column selection
    log = tmp_path / "ref.log"
    log.write_text(_GLOG_LOG)
    _, y_acc, _ = extract_series(str(log), 0)
    assert y_acc == [0.75]
    _, y_loss, _ = extract_series(str(log), 2)
    assert y_loss == [1.0]
    # chart 4: learning rate
    _, y_lr, _ = extract_series(str(train_log), 4)
    assert y_lr[0] == pytest.approx(0.025)


def test_plot_png_when_matplotlib_present(tmp_path, train_log):
    pytest.importorskip("matplotlib")
    from caffe_rtpose_tpu.tools.plot_training_log import main as plot_main

    out = tmp_path / "curve.png"
    assert plot_main(["6", str(out), str(train_log)]) == 0
    assert out.stat().st_size > 1000


def test_nan_loss_starts_new_row(tmp_path):
    """An unparseable output #0 (nan loss) must not merge the block's
    remaining outputs into the previous iteration's row — row creation is
    keyed on NumIters like the reference parse_log.py."""
    log = tmp_path / "nan.log"
    log.write_text(
        "Iteration 80, loss = 1.5\n"
        "    Train net output #0: l = 1.5\n"
        "    Train net output #1: acc = 0.9\n"
        "Iteration 100, loss = nan\n"
        "    Train net output #0: l = nan\n"
        "    Train net output #1: acc = 0.5\n"
        "    lr = 0.01\n")
    train_rows, _ = parse_log(str(log))
    assert [r["NumIters"] for r in train_rows] == [80.0, 100.0]
    assert train_rows[0]["acc"] == 0.9
    assert train_rows[1]["acc"] == 0.5
    assert "l" not in train_rows[1]  # nan value itself is unparseable
