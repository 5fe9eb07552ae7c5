"""COMPOSED cross-implementation parity: image -> joints/JSON, every stage
executed from reference source.

The oracle side chains three binaries, each built from UNMODIFIED
reference code:

  1. ref_oracle      — CNN forward (net.cpp + conv/pool/relu/concat) to
                       concat_stage7, from the shipped deploy prototxt with
                       seeded weights (native/ref_oracle/build.sh);
  2. gpu_oracle      — the REAL GPU ImResize (multi-scale bicubic average,
                       imresize_layer.cu) and GPU NMS (8-neighbor + 7x7
                       refinement, nms_layer.cu) executed via the
                       CUDA-emulation shim (build_gpu.sh);
  3. ref_connect     — connectLimbs/connectLimbsCOCO greedy assembly from
                       the rtpose.cpp translation unit (build_connect.sh).

The repo side is the PRODUCTION fused estimator (pose/estimator.py: one
jitted program CNN->upsample->NMS->pair scoring + host assembly) run on
the same weights and net input.  People counts and joints must agree, and
the rtpose JSON written from both joint sets must be byte-identical —
this is the full "rtpose.bin GPU path" parity chain of BASELINE.md
(1px/0.01), with no hand-derived oracle anywhere in the loop.

Configurations: COCO at the production 656x368, COCO 3-scale (reduced res
to keep the serial-emulation oracle affordable), MPI.  The NMS threshold
per case is calibrated (deterministically, from the oracle's own resized
maps) so every part stays under max_peaks: the reference stores the
UNCAPPED count and connectLimbs indexes out of range when it exceeds
max_peaks (rtpose.cpp:841-843) — at overflow the reference's behavior is
undefined, so parity is only meaningful below it.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/ref_oracle_build"
HERE = os.path.dirname(__file__)
ORACLE_DIR = os.path.join(HERE, "..", "native", "ref_oracle")

COCO_PROTO = f"{REF}/model/coco/pose_deploy_linevec.prototxt"
MPI_PROTO = f"{REF}/model/mpi/pose_deploy_linevec.prototxt"


def _build(script, binary):
    r = subprocess.run(
        ["bash", os.path.join(ORACLE_DIR, script), BUILD],
        capture_output=True,
        text=True,
    )
    path = os.path.join(BUILD, binary)
    if r.returncode != 0 or not os.path.exists(path):
        pytest.skip(f"{script} failed: {r.stderr[-500:]}")
    return path


@pytest.fixture(scope="session")
def oracles():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    return {
        "cnn": _build("build.sh", "ref_oracle"),
        "gpu": _build("build_gpu.sh", "gpu_oracle"),
        "connect": _build("build_connect.sh", "ref_connect"),
    }


def _truncated_proto(src_path, out_path, num, h, w):
    """Deploy prototxt up to (not including) the resize layer, with the
    input reshaped to (num_scales, 3, h, w) — warmup's reshape
    (rtpose.cpp:188-191) expressed in the file both sides consume."""
    src = open(src_path).read()
    cut = src.index('layer {\n  name: "resize"')
    head, rest = src[:cut].split("input_dim:", 1)
    body = "\n".join(rest.split("\n")[4:])
    open(out_path, "w").write(
        f"{head}input_dim: {num}\ninput_dim: 3\n"
        f"input_dim: {h}\ninput_dim: {w}\n{body}"
    )


def _peak_values(heat):
    """Per-channel values of strict-8-neighbor interior local maxima."""
    c = heat[:, 1:-1, 1:-1]
    m = np.ones(c.shape, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m &= c > heat[:, 1 + dy : heat.shape[1] - 1 + dy,
                          1 + dx : heat.shape[2] - 1 + dx]
    return [c[i][m[i]] for i in range(heat.shape[0])]


def _calibrate_threshold(heat, max_peaks, need=None):
    """Threshold keeping every channel safely under max_peaks (see module
    docstring on the reference's overflow UB), placed MID-GAP between the
    actual maxima values so float rounding between the two implementations
    cannot flip a borderline peak.  ``need`` caps peaks per channel (default
    max_peaks - 4); smaller values also thin the greedy-assembly candidate
    set, which reduces near-tie score pairs that cross-implementation float
    noise could flip (test_ref_image_e2e relies on this)."""
    vals = _peak_values(heat)
    need = (max_peaks - 4) if need is None else need
    cut = 0.0  # minimum threshold such that every channel count <= need
    for v in vals:
        if v.size > need:
            cut = max(cut, float(np.partition(v, -need - 1)[-need - 1]))
    above = np.sort(np.concatenate([v[v > cut] for v in vals]))
    assert above.size > 0, "no peaks to keep after calibration"
    thr = (cut + float(above[0])) / 2.0
    # must be positive: peaks then have positive centers (no reference
    # 0/0-NaN refinement) and score>0 window samples
    return max(thr, 1e-3 * float(np.abs(heat).max()))


def reseed_weights(est, rs):
    """Reseed an estimator's weights deterministically (He gain: this net
    is ~45 ReLU-conv layers deep — smaller gains collapse activations to
    ~2^-45, underflowing the estimator's f16 pair-score packing).  Shared
    by the composed-e2e and image-e2e suites."""
    import jax.numpy as jnp

    for name in sorted(est.net.params):
        new = []
        for p in est.net.params[name]:
            a = np.asarray(p)
            fan_in = a.size // a.shape[-1] if a.ndim > 1 else a.size
            new.append(jnp.asarray(
                (rs.randn(*a.shape) * np.sqrt(2.0 / max(fan_in, 1))).astype(np.float32)))
        est.net.params[name] = new


def normalize_branches(est, probe_input):
    """Normalize each final branch conv (the only consumers of its output)
    so the 57-channel maps have healthy magnitude on `probe_input`: a
    depth-45 seeded net otherwise drifts orders of magnitude, breaking
    absolute thresholds and the estimator's f16 pair-score packing.
    Scaling a final conv's W and b scales its output linearly, so parity
    is unaffected (the rescaled weights are what both sides load)."""
    import jax.numpy as jnp

    producers = {t: lv for lv in est.net.layer_views for t in lv.top}
    concat_lv = producers[est.heatmap_blob if est.lowres_blob is None
                          else est.lowres_blob]
    branch_tops = list(concat_lv.bottom)
    acts = est.net.forward({"image": probe_input}, outputs=branch_tops)
    for b in branch_tops:
        lname = producers[b].name
        a = np.asarray(acts[b])  # (N, C, h, w) caffe layout
        std_c = a.std(axis=(0, 2, 3)).astype(np.float32)
        s = (0.25 / np.maximum(std_c, 1e-20)).astype(np.float32)
        W, bias = [np.asarray(p) for p in est.net.params[lname]]
        est.net.params[lname] = [jnp.asarray(W * s), jnp.asarray(bias * s)]


def _composed_case(oracles, tmp, proto_src, mode, net_w, net_h,
                   num_scales, start_scale, scale_gap, seed):
    from caffe_rtpose_tpu.pipeline.runner import write_json_file
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator
    from caffe_rtpose_tpu.pose.preprocess import preprocess_frame

    # --- shared model: the production estimator, reseeded deterministically
    est = PoseEstimator(
        proto_src,
        net_resolution=(net_w, net_h),
        num_scales=num_scales,
        start_scale=start_scale,
        scale_gap=scale_gap,
        seed=seed,
    )
    rs = np.random.RandomState(seed)
    reseed_weights(est, rs)
    num_parts, max_peaks = est.num_parts, est.max_peaks
    pc = est.params_connect

    # --- shared input: synthetic frame through the production preprocess
    frame = (rs.rand(net_h * 2, net_w * 2, 3) * 255).astype(np.uint8)
    pf = preprocess_frame(
        frame, net_w, net_h, num_scales=num_scales,
        start_scale=start_scale, scale_gap=scale_gap,
    )
    net_input = pf.net_input  # (S, 3, net_h, net_w) float32

    normalize_branches(est, net_input)

    model = os.path.join(tmp, "seeded.caffemodel")
    est.net.save_caffemodel(model)

    # --- oracle stage 1: reference CNN to concat_stage7
    proto = os.path.join(tmp, "trunc.prototxt")
    _truncated_proto(proto_src, proto, num_scales, net_h, net_w)
    raw = os.path.join(tmp, "input.raw")
    net_input.astype(np.float32).tofile(raw)
    prefix = os.path.join(tmp, "cnn")
    out_blob = "concat_stage7"
    r = subprocess.run(
        [oracles["cnn"], proto, model, raw, prefix, out_blob],
        capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    shape = tuple(int(v) for v in r.stdout.split()[1:])
    concat = np.fromfile(prefix + f".{out_blob}.raw", np.float32).reshape(shape)
    s, c_all, h8, w8 = concat.shape
    assert (s, h8 * 8, w8 * 8) == (num_scales, net_h, net_w)

    # --- oracle stage 2: REAL GPU ImResize (x8 + multi-scale average)
    cin = os.path.join(tmp, "concat.raw")
    concat.tofile(cin)
    hm_path = os.path.join(tmp, "resized.raw")
    r = subprocess.run(
        [oracles["gpu"], "imresize", cin, hm_path, str(s), str(c_all),
         str(h8), str(w8), "8", "0", "0", repr(start_scale), repr(scale_gap)],
        capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    heatmap = np.fromfile(hm_path, np.float32).reshape(c_all, net_h, net_w)

    thr = _calibrate_threshold(heatmap[:num_parts], max_peaks)

    # --- oracle stage 3: REAL GPU NMS
    pk_path = os.path.join(tmp, "peaks.raw")
    r = subprocess.run(
        [oracles["gpu"], "nms", hm_path, pk_path, "1", str(c_all),
         str(net_h), str(net_w), str(num_parts), str(max_peaks), repr(thr)],
        capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    ref_peaks = np.fromfile(pk_path, np.float32).reshape(
        num_parts, max_peaks + 1, 3)
    assert ref_peaks[:, 0, 0].max() <= max_peaks, "calibration failed"

    # --- oracle stage 4: reference greedy limb assembly (display coords)
    disp_w, disp_h = net_w * 2, net_h * 2
    out_path = os.path.join(tmp, "joints.raw")
    r = subprocess.run(
        [oracles["connect"], mode, hm_path, pk_path, str(max_peaks),
         str(net_w), str(net_h), str(disp_w), str(disp_h),
         repr(pc.inter_threshold), str(pc.inter_min_above_threshold),
         str(pc.min_subset_cnt), repr(pc.min_subset_score), out_path],
        capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stderr[-800:]
    blob = open(out_path, "rb").read()
    (ref_cnt,) = struct.unpack("<i", blob[:4])
    ref_joints = np.frombuffer(blob[4:], np.float32).reshape(
        ref_cnt, num_parts, 3)

    # --- repo side: the production fused estimator on the same input
    res = est.estimate_from_net_input(
        net_input,
        scale_xy=(disp_w / net_w, disp_h / net_h),
        nms_threshold=thr,
    )

    # peaks (net coords) and joints (display coords) must match
    np.testing.assert_array_equal(
        res.peaks[:, 0, 0].astype(int), ref_peaks[:, 0, 0].astype(int))
    for p in range(num_parts):
        k = int(ref_peaks[p, 0, 0])
        if k:
            np.testing.assert_allclose(
                res.peaks[p, 1 : k + 1], ref_peaks[p, 1 : k + 1],
                rtol=1e-3, atol=2e-3)
    assert res.num_people == ref_cnt, (res.num_people, ref_cnt)
    if ref_cnt:
        np.testing.assert_allclose(res.joints, ref_joints, rtol=1e-3, atol=5e-3)

    # JSON written from both joint sets must be byte-identical
    ours_json = os.path.join(tmp, "ours.json")
    ref_json = os.path.join(tmp, "ref.json")
    write_json_file(ours_json, np.round(res.joints, 2), res.num_people, 1.0, num_parts)
    write_json_file(ref_json, np.round(ref_joints, 2), ref_cnt, 1.0, num_parts)
    assert open(ours_json, "rb").read() == open(ref_json, "rb").read()
    return ref_cnt, int(ref_peaks[:, 0, 0].sum())


def test_composed_coco_production_resolution(oracles, tmp_path):
    """COCO at the production default 656x368, single scale — the
    BASELINE.md north-star configuration."""
    cnt, peaks = _composed_case(
        oracles, str(tmp_path), COCO_PROTO, "coco",
        net_w=656, net_h=368, num_scales=1,
        start_scale=1.0, scale_gap=0.3, seed=21,
    )
    assert peaks > 20


def test_composed_coco_three_scales(oracles, tmp_path):
    """COCO 3-scale: exercises the fused per-scale pad offsets in ImResize
    and the scale-averaged NMS input (reduced res: the serial-emulation
    oracle CNN runs 3 scales)."""
    cnt, peaks = _composed_case(
        oracles, str(tmp_path), COCO_PROTO, "coco",
        net_w=320, net_h=176, num_scales=3,
        start_scale=1.0, scale_gap=0.3, seed=22,
    )
    assert peaks > 10


def test_composed_mpi(oracles, tmp_path):
    """MPI 15-part variant (different descriptor, connect params,
    max_peaks=20) through the same executed-reference chain."""
    cnt, peaks = _composed_case(
        oracles, str(tmp_path), MPI_PROTO, "mpi",
        net_w=496, net_h=272, num_scales=1,
        start_scale=1.0, scale_gap=0.3, seed=23,
    )
    assert peaks > 10
