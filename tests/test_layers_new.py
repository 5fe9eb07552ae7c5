"""Filter, LSTMUnit, and Python layer types."""

import numpy as np

from caffe_rtpose_tpu.core.net import Net


class TestFilter:
    def test_compacts_kept_rows(self):
        proto = {
            "name": "f",
            "input": ["x", "sel"],
            "input_shape": [{"dim": [5, 2]}, {"dim": [5]}],
            "layer": [
                {"name": "filt", "type": "Filter", "bottom": ["x", "sel"],
                 "top": ["y"]},
            ],
        }
        net = Net(proto, phase="TEST")
        x = np.arange(10, dtype=np.float32).reshape(5, 2)
        sel = np.array([1, 0, 1, 1, 0], np.float32)
        y = net.forward({"x": x, "sel": sel})["y"]
        np.testing.assert_allclose(y[:3], x[[0, 2, 3]])
        np.testing.assert_allclose(y[3:], 0.0)


class TestLSTMUnit:
    def test_gate_math(self):
        proto = {
            "name": "u",
            "input": ["c_prev", "X", "cont"],
            "input_shape": [{"dim": [1, 2, 3]}, {"dim": [1, 2, 12]}, {"dim": [1, 2]}],
            "layer": [
                {"name": "unit", "type": "LSTMUnit",
                 "bottom": ["c_prev", "X", "cont"], "top": ["c", "h"]},
            ],
        }
        net = Net(proto, phase="TEST")
        rs = np.random.RandomState(0)
        c_prev = rs.randn(1, 2, 3).astype(np.float32)
        X = rs.randn(1, 2, 12).astype(np.float32)
        cont = np.array([[1.0, 0.0]], np.float32)
        out = net.forward({"c_prev": c_prev, "X": X, "cont": cont})

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        # reference gate order i, f, o, g (lstm_unit_layer.cpp:53-62)
        i = sig(X[..., :3])
        f = sig(X[..., 3:6]) * cont[..., None]
        o = sig(X[..., 6:9])
        g = np.tanh(X[..., 9:])
        c = f * c_prev + i * g
        h = o * np.tanh(c)
        np.testing.assert_allclose(out["c"], c, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out["h"], h, rtol=1e-5, atol=1e-6)


class EchoScale:
    """User Python layer for the test below (python_layer protocol)."""

    def setup(self, bottom, top):
        self.k = float(self.param_str or 2.0)

    def reshape(self, bottom, top):
        top[0].reshape(*bottom[0].data.shape)

    def forward(self, bottom, top):
        top[0].data[...] = bottom[0].data * self.k


class TestPythonLayer:
    def test_host_callback_layer(self):
        proto = {
            "name": "py",
            "input": ["x"],
            "input_shape": [{"dim": [2, 3, 4, 4]}],
            "layer": [
                {"name": "pyl", "type": "Python", "bottom": ["x"], "top": ["y"],
                 "python_param": {"module": "tests.test_layers_new",
                                  "layer": "EchoScale", "param_str": "3.0"}},
                {"name": "relu", "type": "ReLU", "bottom": ["y"], "top": ["y"]},
            ],
        }
        net = Net(proto, phase="TEST")
        x = np.random.RandomState(0).randn(2, 3, 4, 4).astype(np.float32)
        y = net.forward({"x": x})["y"]
        np.testing.assert_allclose(y, np.maximum(x * 3.0, 0.0), rtol=1e-5, atol=1e-5)
