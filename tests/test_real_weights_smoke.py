"""Released-weights smoke (VERDICT r2 Missing #5 / next-step #8).

The reference ships trained weights via ``model/getModels.sh:3``
(pose_iter_440000.caffemodel, COCO).  They are unfetchable in this offline
image, so every parity suite here runs seeded weights; this module is the
end-to-end check that activates automatically the moment the file exists
(``make fetch-models`` / ``install.sh``): load the real .caffemodel, run a
frame through the eval harness's ``run-list``, and ``joint-diff`` it
against the independent estimate() path at the 1px/0.01 criterion.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COCO_MODEL = os.path.join(REPO, "model/coco/pose_iter_440000.caffemodel")
COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(COCO_MODEL),
    reason="released weights absent (run `make fetch-models` when online)",
)


@pytest.fixture(scope="module")
def val_frame(tmp_path_factory):
    """A deterministic stand-in COCO val frame: smooth structured content
    (not noise) so real weights produce a stable, non-degenerate response."""
    import cv2

    d = tmp_path_factory.mktemp("val")
    h, w = 368, 496
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        127 + 120 * np.sin(xx / 37.0),
        127 + 120 * np.cos(yy / 29.0),
        127 + 120 * np.sin((xx + yy) / 53.0),
    ], axis=-1).astype(np.uint8)
    # a crude figure so person-shaped filters have something to fire on
    cv2.circle(img, (248, 90), 28, (250, 220, 200), -1)          # head
    cv2.rectangle(img, (218, 118), (278, 250), (90, 60, 170), -1)  # torso
    cv2.line(img, (218, 130), (150, 210), (90, 60, 170), 18)       # arms
    cv2.line(img, (278, 130), (346, 210), (90, 60, 170), 18)
    cv2.line(img, (232, 250), (220, 350), (60, 60, 120), 16)       # legs
    cv2.line(img, (264, 250), (276, 350), (60, 60, 120), 16)
    path = d / "val_000001.png"
    cv2.imwrite(str(path), img)
    return d, path, img, h, w


def test_real_weights_load_and_cover_all_layers():
    """Every learnable layer of the deploy net is present in the released
    caffemodel (binary-compatible load, no silently-missing params)."""
    from caffe_rtpose_tpu.proto.caffemodel import load_weights

    names = set(load_weights(COCO_MODEL).keys())
    # VGG trunk + 6-stage two-branch CPM heads
    for must in ("conv1_1", "conv4_4_CPM",
                 "conv5_5_CPM_L1", "conv5_5_CPM_L2",
                 "Mconv7_stage6_L1", "Mconv7_stage6_L2"):
        assert must in names, f"missing {must} in released weights"


def test_run_list_plus_joint_diff(val_frame, tmp_path):
    """run-list (real weights) vs the direct estimate() path on one frame:
    the 1px / 0.01-conf criterion, via the shipped joint-diff tool."""
    import cv2  # noqa: F401  (cv2 presence gates the CLI path)
    import jax.numpy as jnp

    from caffe_rtpose_tpu.pipeline.runner import write_json_file
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    d, img_path, img, h, w = val_frame
    lst = tmp_path / "list.txt"
    lst.write_text(f"0 1 {img_path.name} {h} {w}\n")
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    out_b.mkdir()

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "caffe_rtpose_tpu.tools.eval_pose", "run-list",
         "--list", str(lst), "--image_root", str(d), "--out", str(out_a),
         "--caffeproto", COCO_PROTO, "--caffemodel", COCO_MODEL,
         "--net_resolution", "656x368", "--dtype", "float32"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]

    est = PoseEstimator(COCO_PROTO, weights=COCO_MODEL,
                        net_resolution=(656, 368), dtype=jnp.float32,
                        input_u8=True)
    result, pf = est.estimate(img, disp_w=1280, disp_h=720)
    write_json_file(str(out_b / "val_000001.json"), result.joints,
                    result.num_people, pf.scale, est.num_parts)

    r = subprocess.run(
        [sys.executable, "-m", "caffe_rtpose_tpu.tools.eval_pose",
         "joint-diff", str(out_a), str(out_b),
         "--px_tol", "1.0", "--conf_tol", "0.01"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PARITY OK" in r.stdout

    with open(out_a / "val_000001.json") as f:
        data = json.load(f)
    assert data["version"] == 0.1 and "bodies" in data
