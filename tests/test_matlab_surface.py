"""The matcaffe M-files delegate to Python symbols — verify those symbols
exist and behave (MATLAB itself is not in the image; matlab/README.md)."""

import os
import re

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MATLAB = os.path.join(REPO, "matlab")


class TestBridgeSymbols:
    def test_forward_dict(self, tmp_path):
        from caffe_rtpose_tpu import api as caffe

        proto = tmp_path / "n.prototxt"
        proto.write_text(
            'name: "n"\ninput: "x"\ninput_shape { dim: 1 dim: 3 dim: 4 dim: 4 }\n'
            'layer { name: "r" type: "ReLU" bottom: "x" top: "y" }\n'
        )
        net = caffe.Net(str(proto), caffe.TEST)
        x = np.random.RandomState(0).randn(1, 3, 4, 4).astype(np.float32)
        out = net.forward_dict({"x": x})
        np.testing.assert_allclose(out["y"], np.maximum(x, 0), rtol=1e-6)

    def test_solver_iter_and_solve(self, tmp_path):
        from caffe_rtpose_tpu import api as caffe

        net = tmp_path / "t.prototxt"
        net.write_text(
            'name: "t"\ninput: "x"\ninput_shape { dim: 2 dim: 3 }\n'
            'input: "t"\ninput_shape { dim: 2 dim: 1 }\n'
            'layer { name: "ip" type: "InnerProduct" bottom: "x" top: "p"\n'
            '  inner_product_param { num_output: 1 } }\n'
            'layer { name: "l" type: "EuclideanLoss" bottom: "p" bottom: "t" top: "l" }\n'
        )
        sol = tmp_path / "s.prototxt"
        sol.write_text(f'net: "{net}"\nbase_lr: 0.1\nlr_policy: "fixed"\nmax_iter: 3\n')
        rs = np.random.RandomState(0)
        s = caffe.SGDSolver(str(sol), data_fn=lambda it: {
            "x": rs.randn(2, 3).astype(np.float32),
            "t": rs.randn(2, 1).astype(np.float32),
        })
        assert s.iter == 0
        s.solve()
        assert s.iter == 3

    def test_other_bridge_symbols(self):
        import caffe_rtpose_tpu
        from caffe_rtpose_tpu import api as caffe
        from caffe_rtpose_tpu.core.data_layers import read_mean_binaryproto

        assert caffe_rtpose_tpu.__version__
        assert callable(caffe.load_image)
        assert callable(read_mean_binaryproto)


class TestMFilesReferenceRealSymbols:
    def test_m_files_exist_and_reference_bridge(self):
        net_m = open(os.path.join(MATLAB, "+caffe", "Net.m")).read()
        assert "caffe_rtpose_tpu.api" in net_m
        assert "forward_dict" in net_m
        solver_m = open(os.path.join(MATLAB, "+caffe", "Solver.m")).read()
        assert "SGDSolver" in solver_m
        for f in ["io.m", "set_mode_cpu.m", "set_mode_gpu.m", "set_device.m",
                  "version.m", "reset_all.m"]:
            assert os.path.exists(os.path.join(MATLAB, "+caffe", f)), f

    def test_m_file_python_calls_resolve(self):
        """Every py.<module>.<attr> reference in the M-files must resolve."""
        import importlib

        pat = re.compile(r"py\.importlib\.import_module\('([\w\.]+)'\)")
        for root, _, files in os.walk(MATLAB):
            for f in files:
                if not f.endswith(".m"):
                    continue
                src = open(os.path.join(root, f)).read()
                for mod in pat.findall(src):
                    importlib.import_module(mod)


def test_blob_layer_bridge_attributes(tmp_path):
    """The attributes Blob.m / Layer.m / get_net.m / run_tests.m touch on
    the Python side must exist and behave (the MATLAB engine would call
    exactly these)."""
    import numpy as np

    from caffe_rtpose_tpu import api as caffe

    p = tmp_path / "m.prototxt"
    p.write_text("""
name: "m" input: "x" input_shape { dim: 1 dim: 2 dim: 4 dim: 4 }
layer { name: "c" type: "Convolution" bottom: "x" top: "y"
  convolution_param { num_output: 3 kernel_size: 3 pad: 1 } }
""")
    net = caffe.Net(str(p), caffe.TEST)
    # Net.m layer(): _layer_names + layers[i].blobs/.type
    assert net._layer_names == ["c"]
    lay = net.layers[0]
    assert lay.type == "Convolution"
    assert lay.blobs[0].data.shape == (3, 2, 3, 3)
    # Blob.m: .data/.diff settable ndarrays, .shape tuple
    b = net.blobs["x"]
    assert tuple(b.shape) == (1, 2, 4, 4)
    b.data = np.ones(b.shape, np.float32)
    b.diff = np.zeros(b.shape, np.float32)
    # run_tests.m flow: forward through the facade
    out = net.forward(x=np.random.rand(1, 2, 4, 4).astype(np.float32))
    assert out["y"].shape == (1, 3, 4, 4)
