"""Cross-IMPLEMENTATION parity for the limb assembly: the reference's own
``connectLimbs`` / ``connectLimbsCOCO`` / ``distanceThresholdPeaks``
(examples/rtpose/rtpose.cpp:549-1076, compiled UNMODIFIED into
native/ref_oracle/build_connect.sh with its main() renamed away) run the
same net-resolution PAF maps + NMS peak buffers as
``pose/connect.py``'s device scoring + host greedy assembly, and the
resulting people/joints must agree.

This is the second half of the "joints within 1px/0.01 of rtpose.bin"
criterion (BASELINE.md): the CNN half is covered by tests/test_ref_parity
(concat_stage7), this covers candidate scoring -> greedy matching ->
subset growth -> filtering -> display rescale, against the reference's
actual C++, not a re-derived oracle.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/ref_oracle_build"
ORACLE = os.path.join(BUILD, "ref_connect")
HERE = os.path.dirname(__file__)
BUILD_SH = os.path.join(HERE, "..", "native", "ref_oracle",
                        "build_connect.sh")

NET_W, NET_H = 112, 80
DISP_W, DISP_H = 448, 320
MAX_PEAKS = 8


@pytest.fixture(scope="session")
def oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    r = subprocess.run(["bash", BUILD_SH, BUILD], capture_output=True,
                       text=True)
    if r.returncode != 0 or not os.path.exists(ORACLE):
        pytest.skip(f"ref_connect build failed: {r.stderr[-500:]}")
    return ORACLE


def _synthetic_scene(rs, desc, structured):
    """Peaks + PAF maps at net resolution.  ``structured`` draws a couple
    of 'people' whose limbs have aligned PAF fields (so real connections
    form); unstructured is pure noise (exercises the reject paths)."""
    num_parts = desc.num_parts
    c_total = len(desc.part_names) + 2 * desc.num_limbs
    peaks = np.zeros((num_parts, MAX_PEAKS + 1, 3), np.float32)
    heatmap = (rs.randn(c_total, NET_H, NET_W) * 0.15).astype(np.float32)

    people = []
    if structured:
        for _ in range(3):
            cx, cy = rs.uniform(20, NET_W - 20), rs.uniform(16, NET_H - 16)
            pts = {p: (np.float32(cx + rs.uniform(-14, 14)),
                       np.float32(cy + rs.uniform(-12, 12)))
                   for p in range(num_parts) if rs.rand() > 0.25}
            people.append(pts)
        for pts in people:
            for p, (x, y) in pts.items():
                n = int(peaks[p, 0, 0])
                if n >= MAX_PEAKS:
                    continue
                x = np.float32(np.clip(x, 1.0, NET_W - 2.0))
                y = np.float32(np.clip(y, 1.0, NET_H - 2.0))
                peaks[p, n + 1] = (x, y, rs.uniform(0.3, 0.9))
                peaks[p, 0, 0] = n + 1
        yy, xx = np.mgrid[0:NET_H, 0:NET_W].astype(np.float32)
        for pts in people:
            for k in range(desc.num_limbs):
                a, b = desc.limb(k)
                if a not in pts or b not in pts:
                    continue
                ax, ay = pts[a]
                bx, by = pts[b]
                d = np.hypot(bx - ax, by - ay)
                if d < 1e-3:
                    continue
                ux, uy = (bx - ax) / d, (by - ay) / d
                # tube of aligned unit vectors along the limb
                t = ((xx - ax) * ux + (yy - ay) * uy) / d
                dist = np.abs(-(xx - ax) * uy + (yy - ay) * ux)
                m = (t > -0.1) & (t < 1.1) & (dist < 4.0)
                cx_ch, cy_ch = desc.paf_channels(k)
                # per-pixel magnitude jitter: with constant unit vectors,
                # different pairs produce EXACTLY tied connection scores,
                # and the reference's std::sort is unstable — tie order is
                # genuinely unspecified there (ours is a stable sort)
                mag = rs.uniform(0.7, 1.0, m.sum()).astype(np.float32)
                heatmap[cx_ch][m] = ux * mag
                heatmap[cy_ch][m] = uy * mag
    else:
        counts = rs.randint(0, MAX_PEAKS + 1, num_parts)
        for p in range(num_parts):
            peaks[p, 0, 0] = counts[p]
            for i in range(counts[p]):
                peaks[p, i + 1] = (rs.uniform(1, NET_W - 2),
                                   rs.uniform(1, NET_H - 2),
                                   rs.uniform(0.1, 0.9))
    return heatmap, peaks


def _run_oracle(oracle, tmp, heatmap, peaks, mode, params):
    hm = os.path.join(tmp, "heatmap.raw")
    pk = os.path.join(tmp, "peaks.raw")
    out = os.path.join(tmp, "joints.raw")
    heatmap.astype(np.float32).tofile(hm)
    peaks.astype(np.float32).tofile(pk)
    r = subprocess.run(
        [oracle, mode, hm, pk, str(MAX_PEAKS), str(NET_W), str(NET_H),
         str(DISP_W), str(DISP_H), repr(params.inter_threshold),
         str(params.inter_min_above_threshold), str(params.min_subset_cnt),
         repr(params.min_subset_score), out],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    raw = open(out, "rb").read()
    if mode == "dist":
        return np.frombuffer(raw, np.float32).reshape(peaks.shape)
    (cnt,) = struct.unpack("<i", raw[:4])
    num_parts = 15 if mode == "mpi" else 18
    joints = np.frombuffer(raw[4:], np.float32).reshape(cnt, num_parts, 3)
    return cnt, joints


@pytest.mark.parametrize("structured", [True, False],
                         ids=["structured", "noise"])
@pytest.mark.parametrize("seed", [0, 3, 11])
def test_connect_coco_matches_reference(oracle, tmp_path, seed, structured):
    import jax.numpy as jnp

    from caffe_rtpose_tpu.pose.connect import assemble, score_pairs
    from caffe_rtpose_tpu.pose.descriptor import COCO_18, ConnectParams

    params = ConnectParams(nms_threshold=0.05, min_subset_cnt=3,
                           min_subset_score=0.4, inter_threshold=0.05,
                           inter_min_above_threshold=9)
    rs = np.random.RandomState(seed)
    heatmap, peaks = _synthetic_scene(rs, COCO_18, structured)

    cnt, joints = _run_oracle(oracle, str(tmp_path), heatmap, peaks,
                              "coco", params)

    score, count = score_pairs(jnp.asarray(heatmap), jnp.asarray(peaks),
                               COCO_18, jnp.float32(params.inter_threshold))
    res = assemble(peaks, np.asarray(score), np.asarray(count), COCO_18,
                   params, scale_xy=(DISP_W / NET_W, DISP_H / NET_H))

    assert res.num_people == cnt, (res.num_people, cnt)
    np.testing.assert_allclose(res.joints, joints, rtol=1e-5, atol=2e-4)


@pytest.mark.parametrize("structured", [True, False],
                         ids=["structured", "noise"])
@pytest.mark.parametrize("seed", [1, 5])
def test_connect_mpi_matches_reference(oracle, tmp_path, seed, structured):
    import jax.numpy as jnp

    from caffe_rtpose_tpu.pose.connect import assemble, score_pairs
    from caffe_rtpose_tpu.pose.descriptor import MPI_15, ConnectParams

    params = ConnectParams(nms_threshold=0.2, min_subset_cnt=3,
                           min_subset_score=0.4, inter_threshold=0.01,
                           inter_min_above_threshold=8)
    rs = np.random.RandomState(seed)
    heatmap, peaks = _synthetic_scene(rs, MPI_15, structured)

    cnt, joints = _run_oracle(oracle, str(tmp_path), heatmap, peaks,
                              "mpi", params)

    score, count = score_pairs(jnp.asarray(heatmap), jnp.asarray(peaks),
                               MPI_15, jnp.float32(params.inter_threshold))
    res = assemble(peaks, np.asarray(score), np.asarray(count), MPI_15,
                   params, scale_xy=(DISP_W / NET_W, DISP_H / NET_H))

    assert res.num_people == cnt, (res.num_people, cnt)
    np.testing.assert_allclose(res.joints, joints, rtol=1e-5, atol=2e-4)


def test_distance_threshold_peaks_matches_reference(oracle, tmp_path):
    """The dead-code peak dedup (rtpose.cpp:753-806) — ours replicates the
    in-place swap behavior exactly."""
    from caffe_rtpose_tpu.pose.connect import distance_threshold_peaks

    rs = np.random.RandomState(4)
    # clustered peaks so the 6px threshold actually dedups
    peaks = np.zeros((18, MAX_PEAKS + 1, 3), np.float32)
    for p in range(18):
        n = rs.randint(0, MAX_PEAKS + 1)
        peaks[p, 0, 0] = n
        base = rs.uniform(10, 60, 2)
        for i in range(n):
            peaks[p, i + 1] = (base[0] + rs.uniform(-5, 5),
                               base[1] + rs.uniform(-5, 5),
                               rs.uniform(0.1, 0.9))
    heatmap = np.zeros((57, NET_H, NET_W), np.float32)

    from caffe_rtpose_tpu.pose.descriptor import ConnectParams
    params = ConnectParams(0.05, 3, 0.4, 0.05, 9)
    want = _run_oracle(oracle, str(tmp_path), heatmap, peaks, "dist",
                       params)
    got = distance_threshold_peaks(peaks)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

