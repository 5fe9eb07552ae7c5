"""Behavior parity with the reference's python test suite
(python/caffe/test/ there) for the cases not already covered by
test_api/test_layers_new: Python-layer phase/reshape/exception, net_spec
lenet + zero-tops, the coord_map case matrix, top/bottom names, and the
legacy BlobProto formats.
"""

import numpy as np
import pytest

from caffe_rtpose_tpu import api as caffe

# --------------------------------------------------------- python layers
# (reference python/caffe/test/test_python_layer.py)


class PhaseProbe:
    """Emits a constant that depends on self.phase (test_phase there)."""

    def setup(self, bottom, top):
        pass

    def reshape(self, bottom, top):
        top[0].reshape(1)

    def forward(self, bottom, top):
        top[0].data[...] = float(self.phase)

    def backward(self, top, propagate_down, bottom):
        pass


class ReshapingDouble:
    """Output shape follows the input shape (test_reshape there)."""

    def setup(self, bottom, top):
        pass

    def reshape(self, bottom, top):
        top[0].reshape(*bottom[0].shape)

    def forward(self, bottom, top):
        top[0].data[...] = 2 * bottom[0].data

    def backward(self, top, propagate_down, bottom):
        bottom[0].diff[...] = 2 * top[0].diff


class Exploder:
    def setup(self, bottom, top):
        raise RuntimeError("boom from python layer setup")


def _python_net(tmp_path, layer, shape=(2, 3), with_input=True):
    body = ""
    if with_input:
        dims = "".join(f" dim: {d}" for d in shape)
        body += f'input: "x"\ninput_shape {{{dims} }}\n'
    body += (
        f'layer {{ name: "p" type: "Python" '
        f'{"bottom: \"x\" " if with_input else ""}top: "y"\n'
        f'  python_param {{ module: "test_pycaffe_ref_suite" '
        f'layer: "{layer}" }} }}\n'
    )
    p = tmp_path / "pynet.prototxt"
    p.write_text('name: "pn"\n' + body)
    return str(p)


class TestPythonLayerSemantics:
    def test_phase(self, tmp_path):
        """self.phase reflects the net phase (caffe.TRAIN=0 / caffe.TEST=1),
        reference test_python_layer.py::test_phase."""
        proto = _python_net(tmp_path, "PhaseProbe", with_input=False)
        for phase, want in ((caffe.TRAIN, 0.0), (caffe.TEST, 1.0)):
            net = caffe.Net(proto, phase)
            out = net.forward()
            assert float(np.ravel(out["y"])[0]) == want

    def test_reshape(self, tmp_path):
        """The layer's reshape() sizes the top from the bottom
        (reference test_reshape)."""
        proto = _python_net(tmp_path, "ReshapingDouble", shape=(4, 5))
        net = caffe.Net(proto, caffe.TEST)
        x = np.random.RandomState(0).randn(4, 5).astype(np.float32)
        out = net.forward(x=x)
        assert out["y"].shape == (4, 5)
        np.testing.assert_allclose(out["y"], 2 * x, rtol=1e-6)

    def test_backward(self, tmp_path):
        proto = _python_net(tmp_path, "ReshapingDouble", shape=(3, 3))
        net = caffe.Net(proto, caffe.TRAIN)
        x = np.random.RandomState(1).randn(3, 3).astype(np.float32)
        net.forward(x=x)
        grads = net.backward(y=np.ones((3, 3), np.float32))
        np.testing.assert_allclose(grads["x"], 2 * np.ones((3, 3)), rtol=1e-6)

    def test_exception_propagates(self, tmp_path):
        """A raising python layer fails net construction loudly
        (reference test_exception)."""
        proto = _python_net(tmp_path, "Exploder")
        with pytest.raises(RuntimeError, match="boom"):
            caffe.Net(proto, caffe.TEST)


# --------------------------------------------------------------- net_spec
# (reference python/caffe/test/test_net_spec.py)


def _lenet_spec(batch):
    L, P = caffe.layers, caffe.params
    n = caffe.NetSpec()
    n.data = L.Input(shape=dict(dim=[batch, 1, 28, 28]))
    n.conv1 = L.Convolution(n.data, kernel_size=5, num_output=20,
                            weight_filler=dict(type='xavier'))
    n.pool1 = L.Pooling(n.conv1, kernel_size=2, stride=2,
                        pool=P.Pooling.MAX)
    n.ip1 = L.InnerProduct(n.pool1, num_output=50,
                           weight_filler=dict(type='xavier'))
    n.relu1 = L.ReLU(n.ip1, in_place=True)
    n.score = L.InnerProduct(n.relu1, num_output=10,
                             weight_filler=dict(type='xavier'))
    return n


class TestNetSpec:
    def test_params_enum_accessor(self):
        """caffe.params parity (net_spec P): enum values resolve."""
        P = caffe.params
        assert P.Pooling.MAX == 0 and P.Pooling.AVE == 1
        assert P.Pooling.STOCHASTIC == 2
        assert P.Eltwise.SUM == 1

    def test_lenet_builds_and_runs(self, tmp_path):
        """LeNet-shaped NetSpec -> prototxt -> running Net (reference
        test_lenet checks the generated proto; going further, build it)."""
        n = _lenet_spec(2)
        text = n.to_prototxt()
        assert 'type: "Convolution"' in text and "pool: MAX" in text
        path = tmp_path / "lenet.prototxt"
        path.write_text(text)
        net = caffe.Net(str(path), caffe.TEST)
        out = net.forward(data=np.zeros((2, 1, 28, 28), np.float32))
        assert out["score"].shape == (2, 10)

    def test_zero_tops(self):
        """ntop=0 layers render without a top (reference test_zero_tops)."""
        L = caffe.layers
        n = caffe.NetSpec()
        n.data = L.Input(shape=dict(dim=[2, 3]))
        n.silence = L.Silence(n.data, ntop=0)
        text = n.to_prototxt()
        assert 'type: "Silence"' in text


# -------------------------------------------------------------- coord_map
# (reference python/caffe/test/test_coord_map.py — the case matrix)


def _coord_net(tmp_path, body, inputs='input: "x"\ninput_shape '
               '{ dim: 1 dim: 1 dim: 64 dim: 64 }\n'):
    p = tmp_path / "cm.prototxt"
    p.write_text('name: "cm"\n' + inputs + body)
    return caffe.Net(str(p), caffe.TEST)


class TestCoordMapMatrix:
    def test_pass_through(self, tmp_path):
        """Elementwise layers are identity maps (reference test_pass)."""
        from caffe_rtpose_tpu import coord_map as cm

        net = _coord_net(tmp_path,
            'layer { name: "r" type: "ReLU" bottom: "x" top: "r" }\n'
            'layer { name: "p" type: "Power" bottom: "r" top: "p" }\n')
        a, b = cm.coord_map_from_to(net, "p", "x")
        assert (a, b) == (1.0, 0.0)

    def test_padding(self, tmp_path):
        """Padding shifts the offset (reference test_padding)."""
        from caffe_rtpose_tpu import coord_map as cm

        net0 = _coord_net(tmp_path,
            'layer { name: "c" type: "Convolution" bottom: "x" top: "c"\n'
            '  convolution_param { num_output: 1 kernel_size: 5 } }\n')
        a0, b0 = cm.coord_map_from_to(net0, "c", "x")
        net1 = _coord_net(tmp_path,
            'layer { name: "c" type: "Convolution" bottom: "x" top: "c"\n'
            '  convolution_param { num_output: 1 kernel_size: 5 pad: 2 } }\n')
        a1, b1 = cm.coord_map_from_to(net1, "c", "x")
        assert a0 == a1 == 1.0
        assert b0 == 2.0 and b1 == 0.0  # offset = (k-1)/2 - pad

    def test_multi_conv(self, tmp_path):
        """Composition across a conv chain (reference test_multi_conv)."""
        from caffe_rtpose_tpu import coord_map as cm

        net = _coord_net(tmp_path,
            'layer { name: "c1" type: "Convolution" bottom: "x" top: "c1"\n'
            '  convolution_param { num_output: 1 kernel_size: 3 pad: 1 stride: 2 } }\n'
            'layer { name: "c2" type: "Convolution" bottom: "c1" top: "c2"\n'
            '  convolution_param { num_output: 1 kernel_size: 3 pad: 1 stride: 2 } }\n')
        a, b = cm.coord_map_from_to(net, "c2", "x")
        assert a == 4.0  # stride 2 * stride 2

    def test_deconv_inverts(self, tmp_path):
        """conv-pool-deconv chain returns to scale 1 (reference
        test_conv_pool_deconv)."""
        from caffe_rtpose_tpu import coord_map as cm

        net = _coord_net(tmp_path,
            'layer { name: "p" type: "Pooling" bottom: "x" top: "p"\n'
            '  pooling_param { kernel_size: 2 stride: 2 } }\n'
            'layer { name: "d" type: "Deconvolution" bottom: "p" top: "d"\n'
            '  convolution_param { num_output: 1 kernel_size: 2 stride: 2 } }\n')
        a, b = cm.coord_map_from_to(net, "d", "x")
        assert a == 1.0

    def test_catch_unconnected(self, tmp_path):
        from caffe_rtpose_tpu import coord_map as cm

        net = _coord_net(tmp_path,
            'input: "z"\ninput_shape { dim: 1 dim: 1 dim: 8 dim: 8 }\n'
            'layer { name: "r" type: "ReLU" bottom: "x" top: "r" }\n'
            'layer { name: "q" type: "ReLU" bottom: "z" top: "q" }\n')
        with pytest.raises(RuntimeError):
            cm.coord_map_from_to(net, "q", "x")

    def test_catch_scale_mismatch(self, tmp_path):
        from caffe_rtpose_tpu import coord_map as cm

        net = _coord_net(tmp_path,
            'layer { name: "p" type: "Pooling" bottom: "x" top: "p"\n'
            '  pooling_param { kernel_size: 2 stride: 2 } }\n')
        with pytest.raises(RuntimeError):
            cm.crop_params(net, "p", "x")  # downscale cannot crop-align


# ------------------------------------------------------------- net basics
# (reference test_net.py::test_top_bottom_names, test_io.py formats)


def test_top_bottom_names(tmp_path):
    p = tmp_path / "n.prototxt"
    p.write_text(
        'name: "n"\ninput: "x"\ninput_shape { dim: 1 dim: 2 }\n'
        'layer { name: "a" type: "ReLU" bottom: "x" top: "h" }\n'
        'layer { name: "b" type: "Power" bottom: "h" top: "y" }\n')
    net = caffe.Net(str(p), caffe.TEST)
    assert net.top_names == {"a": ["h"], "b": ["y"]}
    assert net.bottom_names == {"a": ["x"], "b": ["h"]}


class TestBlobProtoFormats:
    def test_old_format(self):
        """num/channels/height/width BlobProto (reference test_old_format)."""
        arr = np.random.RandomState(0).rand(2, 3, 4, 5)
        blob = {"num": 2, "channels": 3, "height": 4, "width": 5,
                "data": [float(v) for v in arr.flat]}
        out = caffe.blobproto_to_array(blob)
        np.testing.assert_allclose(out, arr)

    def test_new_format_roundtrip(self):
        arr = np.random.RandomState(1).rand(3, 7)
        out = caffe.blobproto_to_array(caffe.array_to_blobproto(arr))
        np.testing.assert_allclose(out, arr)

    def test_scalar(self):
        """0-d array round-trips (reference test_scalar)."""
        arr = np.array(3.25)
        out = caffe.blobproto_to_array(caffe.array_to_blobproto(arr))
        assert float(out) == 3.25
