"""Native C++ limb assembly vs the pure-Python reference implementation."""

import numpy as np
import pytest

from caffe_rtpose_tpu import native
from caffe_rtpose_tpu.pose import connect as C
from caffe_rtpose_tpu.pose.descriptor import COCO_18

from test_connect import TWO_PEOPLE, peaks_from_truth, synth_people


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_matches_python_two_people(lib):
    desc = COCO_18
    hm = synth_people(desc, TWO_PEOPLE)
    peaks = peaks_from_truth(desc, TWO_PEOPLE)
    params = desc.defaults
    score, count = C.score_pairs_np(hm, peaks, desc, params.inter_threshold)
    py = C.assemble(peaks, score, count, desc, params, scale_xy=(2.0, 1.5))
    nat = native.assemble_native(peaks, score, count, desc, params, scale_xy=(2.0, 1.5))
    assert nat is not None
    joints_n, n = nat
    assert n == py.num_people == 2
    np.testing.assert_allclose(joints_n, py.joints, rtol=1e-5, atol=1e-5)


def test_native_matches_python_random(lib):
    desc = COCO_18
    rs = np.random.RandomState(0)
    params = desc.defaults
    for trial in range(5):
        peaks = np.zeros((18, 65, 3), np.float32)
        for p in range(18):
            n = rs.randint(0, 6)
            peaks[p, 0, 0] = n
            for i in range(1, n + 1):
                peaks[p, i] = (rs.uniform(0, 600), rs.uniform(0, 360), rs.uniform(0.3, 1.0))
        score = rs.rand(19, 64, 64).astype(np.float32) * 2
        count = rs.randint(0, 11, (19, 64, 64)).astype(np.int32)
        py = C.assemble(peaks, score, count, desc, params)
        nat = native.assemble_native(peaks, score, count, desc, params)
        joints_n, n = nat
        assert n == py.num_people
        if n:
            np.testing.assert_allclose(joints_n, py.joints, rtol=1e-5, atol=1e-5)
