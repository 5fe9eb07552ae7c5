"""Execute the REFERENCE's own demo .m files, unmodified and in place
from /root/reference/matlab/, through the restricted MATLAB engine —
the same oracle pattern native/ref_oracle/* uses for the C++/CUDA
sources (compile/execute the reference, never copy it into the repo):

* /root/reference/matlab/hdf5creation/{demo.m,store2hdf5.m} — the
  batched HDF5 shard writer.  The script's own round-trip assertions
  run, and the shard it writes is then consumed by the framework's
  HDF5Data layer — the exact workflow the reference demo documents
  (store2hdf5 writes what HDF5_DATA reads).
* /root/reference/matlab/demo/classification_demo.m — 10-crop CaffeNet
  classification.  The crop protocol and scores are pinned against a
  numpy oracle + direct pycaffe forward on the same weights.

The demo scripts expect to sit next to their data (they write trial.h5 /
list.txt into the CWD and resolve ../+caffe relative to themselves), so
each test stages THE REFERENCE'S files verbatim into a scratch tree; the
repo ships no copy of them.  All tests skip when /root/reference is
absent, exactly like the compiled C++ oracles.
"""

import math
import os
import shutil

import numpy as np
import pytest

from caffe_rtpose_tpu.matlab_engine import (
    MatArray, MatlabEngine, engine_stdout, to_python,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MATLAB = os.path.join(REPO, "matlab")
# the reference's demo sources, executed IN PLACE (never copied into the
# repo) — same skip-if-absent contract as the compiled C++/CUDA oracles
REF_MATLAB = "/root/reference/matlab"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MATLAB),
    reason="reference matlab/ demo sources not available")


class _Chdir:
    def __init__(self, path):
        self.path = str(path)

    def __enter__(self):
        self.prev = os.getcwd()
        os.chdir(self.path)

    def __exit__(self, *exc):
        os.chdir(self.prev)


@pytest.fixture()
def h5_dir(tmp_path):
    """The REFERENCE's matlab/hdf5creation sources staged verbatim into a
    scratch cwd (the demo writes trial.h5 and list.txt into its working
    directory, so it cannot run from the read-only reference tree)."""
    d = tmp_path / "hdf5creation"
    d.mkdir()
    for name in ("demo.m", "store2hdf5.m"):
        shutil.copy(os.path.join(REF_MATLAB, "hdf5creation", name), d / name)
    return d


class TestHdf5Creation:
    def test_demo_script_end_to_end(self, h5_dir):
        import h5py

        np.random.seed(7)  # rand() in the script draws from np.random
        eng = MatlabEngine(MATLAB)
        pre = len(engine_stdout())
        with _Chdir(h5_dir):
            env = eng.run_script(str(h5_dir / "demo.m"))
        out = engine_stdout()[pre:]

        # the script's OWN round-trip verification must have passed
        assert "Success!" in out
        assert "Test failed" not in out
        assert "batch no. 100" in out
        assert "HDF5 filename listed in list.txt" in out

        # shard contents: MATLAB W*H*C*N lands on disk as N x C x H x W
        data_disk = to_python(env["data_disk"])  # (5, 5, 1, 10000)
        with h5py.File(h5_dir / "trial.h5") as f:
            assert f["/data"].shape == (10000, 1, 5, 5)
            assert f["/label"].shape == (10000, 10)
            np.testing.assert_array_equal(
                f["/data"][...],
                np.transpose(data_disk, (3, 2, 1, 0)).astype(np.float32))
        assert (h5_dir / "list.txt").read_text() == "trial.h5"

        # the written shard feeds the framework's HDF5Data layer — the
        # workflow the reference demo exists to document
        from caffe_rtpose_tpu.core.net import Net

        (h5_dir / "abs_list.txt").write_text(str(h5_dir / "trial.h5") + "\n")
        net = Net({
            "name": "h5net",
            "layer": [{"name": "data", "type": "HDF5Data",
                       "top": ["data", "label"],
                       "hdf5_data_param": {
                           "source": str(h5_dir / "abs_list.txt"),
                           "batch_size": 64}}],
        }, phase="TEST")
        got = net.forward({}, outputs=["data", "label"])
        np.testing.assert_allclose(
            got["data"],
            np.transpose(data_disk, (3, 2, 1, 0))[:64].astype(np.float32),
            rtol=1e-6)

    def test_store2hdf5_append_defaults(self, h5_dir):
        """create=0 without startloc: offsets default to one past the
        stored extent (store2hdf5.m's h5info branch)."""
        import h5py

        eng = MatlabEngine(MATLAB)
        rs = np.random.RandomState(0)
        a = rs.rand(4, 4, 2, 3).astype(np.float64)
        la = rs.rand(2, 3)
        b = rs.rand(4, 4, 2, 5)
        lb = rs.rand(2, 5)
        mfile = str(h5_dir / "store2hdf5.m")
        with _Chdir(h5_dir):
            dat_sz, lab_sz = eng.run_mfile(
                mfile, "t2.h5", a, la, 1.0, nargout=2)
            assert list(to_python(dat_sz).reshape(-1)) == [4, 4, 2, 3]
            dat_sz, lab_sz = eng.run_mfile(
                mfile, "t2.h5", b, lb, 0.0, nargout=2)
        assert list(to_python(dat_sz).reshape(-1)) == [4, 4, 2, 8]
        assert list(to_python(lab_sz).reshape(-1)) == [2, 8]
        with h5py.File(h5_dir / "t2.h5") as f:
            stored = f["/data"][...]
        np.testing.assert_allclose(
            stored[:3], np.transpose(a, (3, 2, 1, 0)), rtol=1e-6)
        np.testing.assert_allclose(
            stored[3:], np.transpose(b, (3, 2, 1, 0)), rtol=1e-6)

    def test_store2hdf5_rejects_mismatched_counts(self, h5_dir):
        from caffe_rtpose_tpu.matlab_engine import MatlabError

        eng = MatlabEngine(MATLAB)
        with _Chdir(h5_dir):
            with pytest.raises(MatlabError,
                               match="samples should be matched"):
                eng.run_mfile(str(h5_dir / "store2hdf5.m"), "bad.h5",
                              np.zeros((2, 2, 1, 3)), np.zeros((1, 4)), 1.0)


def _oracle_crops(im_rgb: np.ndarray, mean_data: np.ndarray) -> np.ndarray:
    """numpy transcription of prepare_image (classification_demo.m):
    RGB HxWx3 uint8 -> W x H x C x 10 single, BGR, mean-subtracted."""
    import cv2

    wh = np.transpose(im_rgb[:, :, ::-1], (1, 0, 2)).astype(np.float32)
    rs = cv2.resize(wh, (256, 256), interpolation=cv2.INTER_LINEAR)
    rs = rs - mean_data
    crops = np.zeros((227, 227, 3, 10), np.float32)
    n = 0
    for i in (0, 29):  # indices = [0 256-227] + 1, 0-based
        for j in (0, 29):
            crops[:, :, :, n] = rs[i:i + 227, j:j + 227, :]
            crops[:, :, :, n + 5] = crops[::-1, :, :, n]
            n += 1
    # center = floor(indices(2)/2)+1 with indices(2)=30 (1-based) -> 16,
    # i.e. 0-based offset 15
    c = math.floor(30 / 2)
    crops[:, :, :, 4] = rs[c:c + 227, c:c + 227, :]
    crops[:, :, :, 9] = crops[::-1, :, :, 4]
    return crops


@pytest.fixture(scope="module")
def demo_tree(tmp_path_factory):
    """The directory layout classification_demo.m expects when run from
    caffe/matlab/demo: ../+caffe (package + mean file), ../../models/
    bvlc_reference_caffenet/{deploy.prototxt,*.caffemodel},
    ../../examples/images/cat.jpg."""
    import cv2
    import scipy.io as sio

    from caffe_rtpose_tpu import api
    from caffe_rtpose_tpu.models.caffenet import make_caffenet_deploy
    from caffe_rtpose_tpu.proto import prototxt

    root = tmp_path_factory.mktemp("demo_tree")
    (root / "matlab" / "demo").mkdir(parents=True)
    shutil.copytree(os.path.join(MATLAB, "+caffe"),
                    root / "matlab" / "+caffe")
    # the REFERENCE's own demo script, verbatim
    shutil.copy(os.path.join(REF_MATLAB, "demo", "classification_demo.m"),
                root / "matlab" / "demo" / "classification_demo.m")

    rs = np.random.RandomState(3)
    mean_data = (rs.rand(256, 256, 3) * 50 + 100).astype(np.float32)
    (root / "matlab" / "+caffe" / "imagenet").mkdir()
    sio.savemat(str(root / "matlab" / "+caffe" / "imagenet" /
                    "ilsvrc_2012_mean.mat"), {"mean_data": mean_data})

    mdir = root / "models" / "bvlc_reference_caffenet"
    mdir.mkdir(parents=True)
    # tiny class count keeps the CPU forward fast; the demo's protocol
    # (10-crop, prob top, mean over crops) is class-count agnostic
    deploy = make_caffenet_deploy(batch=10, num_classes=41)
    prototxt.dump_file(deploy, str(mdir / "deploy.prototxt"))
    net = api.Net(str(mdir / "deploy.prototxt"), "TEST", seed=11)
    net.save(str(mdir / "bvlc_reference_caffenet.caffemodel"))

    (root / "examples" / "images").mkdir(parents=True)
    img = (np.random.RandomState(5).rand(300, 400, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(root / "examples" / "images" / "cat.jpg"), img)
    return root, mean_data


class TestClassificationDemo:
    def test_demo_matches_pycaffe_oracle(self, demo_tree):
        import cv2

        from caffe_rtpose_tpu import api

        root, mean_data = demo_tree
        im_rgb = cv2.imread(
            str(root / "examples" / "images" / "cat.jpg"))[:, :, ::-1].copy()
        eng = MatlabEngine(str(root / "matlab"))
        with _Chdir(root / "matlab" / "demo"):
            scores, maxlabel = eng.run_mfile(
                str(root / "matlab" / "demo" / "classification_demo.m"),
                MatArray(im_rgb), 0.0, nargout=2)
        scores = to_python(scores).reshape(-1)
        assert scores.shape == (41,)

        crops = _oracle_crops(im_rgb, mean_data)
        mdir = root / "models" / "bvlc_reference_caffenet"
        net = api.Net(str(mdir / "deploy.prototxt"),
                      str(mdir / "bvlc_reference_caffenet.caffemodel"),
                      "TEST")
        prob = net.forward(
            data=np.transpose(crops, (3, 2, 1, 0)))["prob"]  # (10, 41)
        want = prob.mean(axis=0)
        np.testing.assert_allclose(scores, want, rtol=1e-4, atol=1e-6)
        assert int(maxlabel) == int(np.argmax(want)) + 1
        # softmax output: a genuine distribution
        np.testing.assert_allclose(scores.sum(), 1.0, rtol=1e-3)

    def test_demo_errors_without_weights(self, demo_tree, tmp_path):
        """The reference demo hard-errors when the Model Zoo weights are
        absent (classification_demo.m:80-82 there) — same contract."""
        from caffe_rtpose_tpu.matlab_engine import MatlabError

        root, _ = demo_tree
        bare = tmp_path / "bare"
        (bare / "matlab" / "demo").mkdir(parents=True)
        shutil.copytree(root / "matlab" / "+caffe",
                        bare / "matlab" / "+caffe")
        shutil.copy(root / "matlab" / "demo" / "classification_demo.m",
                    bare / "matlab" / "demo" / "classification_demo.m")
        eng = MatlabEngine(str(bare / "matlab"))
        with _Chdir(bare / "matlab" / "demo"):
            with pytest.raises(MatlabError, match="Model Zoo"):
                eng.run_mfile(
                    str(bare / "matlab" / "demo" / "classification_demo.m"),
                    MatArray(np.zeros((8, 8, 3), np.uint8)), 0.0)
