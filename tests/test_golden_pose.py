"""Golden regression: the fused estimator + assembly must keep producing
byte-stable results for a fixed seed/input (guards NMS/ImResize/scoring/
assembly semantics against drift; the cross-implementation analog of
SURVEY.md section 4's joint-parity recommendation)."""

import dataclasses
import json
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pose_seed7_128x80.json")
REF_COCO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


def test_pose_pipeline_matches_golden():
    import pytest

    if not os.path.exists(REF_COCO):
        pytest.skip("reference not mounted")
    from caffe_rtpose_tpu.pose import connect as C
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    with open(GOLDEN) as f:
        golden = json.load(f)

    est = PoseEstimator(REF_COCO, net_resolution=(128, 80), seed=7, input_u8=True)
    rs = np.random.RandomState(11)
    x = (rs.rand(1, 80, 128, 3) * 255).astype(np.uint8)
    peaks, ps, cnt = est.fetch(est.run_device(x, nms_threshold=-1.0, inter_threshold=-10.0))
    pc = dataclasses.replace(est.params_connect, min_subset_score=-10.0, min_subset_cnt=0)
    res = C.assemble_fast(peaks, ps, cnt, est.descriptor, pc, scale_xy=(1.0, 1.0))

    np.testing.assert_array_equal(peaks[:, 0, 0].astype(int), golden["peaks_counts"])
    np.testing.assert_allclose(peaks[:, 1:4], np.asarray(golden["peaks_head"]),
                               atol=2e-3)
    assert res.num_people == golden["num_people"]
    if golden["num_people"]:
        np.testing.assert_allclose(res.joints, np.asarray(golden["joints"]),
                                   atol=5e-3)


def test_cnn_activations_match_golden():
    """Whole-CNN golden (trunk + 6 stages): fixed seeded weights + input ->
    recorded concat_stage7 activations; guards conv/pool/concat semantics."""
    import pytest

    if not os.path.exists(REF_COCO):
        pytest.skip("reference not mounted")
    import jax.numpy as jnp

    from caffe_rtpose_tpu.core.net import Net

    blob = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                "concat_stage7_seed42.npz"))
    net = Net(REF_COCO, phase="TEST", input_shapes={"image": (1, 3, 80, 128)})
    rs = np.random.RandomState(42)
    for name in sorted(net.params):
        net.params[name] = [
            jnp.asarray(rs.randn(*np.asarray(p).shape).astype(np.float32) * 0.05)
            for p in net.params[name]
        ]
    x = rs.rand(1, 3, 80, 128).astype(np.float32) - 0.5
    np.testing.assert_allclose(x, blob["x"], atol=0)  # rng stream stable
    out = net.forward({"image": x}, outputs=["concat_stage7"])["concat_stage7"]
    np.testing.assert_allclose(out, blob["y"], rtol=2e-4, atol=200)
    # atol covers catastrophic-cancellation noise on near-zero elements of
    # the deliberately large-magnitude activations (scale ~1e7)
