"""WHOLE-CHAIN cross-implementation parity starting at the IMAGE FILE:
pixels in -> JSON out, every oracle stage executed from reference source.

Extends test_ref_composed_e2e (which feeds both sides the same net input)
back to the start of the chain: the oracle side's net input is produced by
the reference's OWN producer code — getFrameFromDir / process_and_pad_image
(rtpose.cpp:302-392,239-269): cv::imread, aspect-preserving warpAffine to
display resolution, the per-scale CV_INTER_AREA resize loop, center pad,
/256-0.5 — compiled unmodified into ref_producer (build_connect.sh) and
driven for real (the frames are popped off the reference's input_queue).

Oracle chain:  image files -> ref_producer (producer threads' code)
               -> ref_oracle (CNN to concat_stage7) -> gpu_oracle imresize
               -> gpu_oracle nms -> ref_connect (greedy assembly) -> JSON.
Repo side:     the ACTUAL CLI, `python -m caffe_rtpose_tpu rtpose
               --image_dir --write_json`, on the same files and seeded
               caffemodel.

JSON comparison is the BASELINE.md criterion — same people, every joint
within 1px / 0.01 conf in original coords — plus a byte-level format
roundtrip (the CLI file must equal re-serializing its own parsed values
through the reference writer layout).  RAW byte equality between the two
chains is not a meaningful target: the CNNs are different float programs,
and their ~1e-6 relative noise is visible in the 6th significant digit of
the writer's %g formatting (the composed e2e rounds to 2 decimals before
byte-comparing for the same reason).  Peak calibration uses need=10
(fewer candidates -> no near-tie pair scores that float noise could flip
in the greedy ordering; seeds are pinned to tie-free configurations).

Preprocess-level parity (net input floats) is asserted separately so a
mismatch localizes.  Bicubic warp pixels are OpenCV-version-dependent
(4.6 vs 5.0 differ on most pixels), so the repo side runs with
CRT_NATIVE_WARP=1 — the warpAffine shim linked against the SAME system
OpenCV the oracle links (native/cvwarp.cpp); everything else (imread PNG
decode, INTER_AREA) is bit-stable across versions.

A final case applies the keyboard threshold tuning (handle_key: =, ], ')
in-process and checks the tuned thresholds flow through to connect parity
(the reference reaches those values only via handleKey, rtpose.cpp:1617-51).
"""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from test_ref_composed_e2e import (
    BUILD,
    COCO_PROTO,
    REF,
    _build,
    _calibrate_threshold,
    _peak_values,
    _truncated_proto,
    normalize_branches,
    reseed_weights,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# small net resolution keeps the serially-emulated oracle CNN affordable
NET_W, NET_H = 320, 176
DISP_W, DISP_H = 512, 288


@pytest.fixture(scope="session")
def oracles():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    return {
        "cnn": _build("build.sh", "ref_oracle"),
        "gpu": _build("build_gpu.sh", "gpu_oracle"),
        "connect": _build("build_connect.sh", "ref_connect"),
        "producer": _build("build_connect.sh", "ref_producer"),
    }


def _make_images(d, seed):
    """Structured multi-blob scenes at two aspect ratios (one wider and one
    taller than the display, hitting both display_scale branches)."""
    import cv2

    rs = np.random.RandomState(seed)
    paths = []
    for k, (h, w) in enumerate([(300, 640), (420, 360)]):
        img = (rs.rand(h, w, 3) * 80).astype(np.uint8)
        for _ in range(6):  # blobs/sticks for structured peaks
            c = tuple(int(v) for v in rs.randint(0, 256, 3))
            x, y = int(rs.randint(0, w)), int(rs.randint(0, h))
            if rs.rand() < 0.5:
                cv2.circle(img, (x, y), int(rs.randint(8, 40)), c, -1)
            else:
                x2, y2 = int(rs.randint(0, w)), int(rs.randint(0, h))
                cv2.line(img, (x, y), (x2, y2), c, int(rs.randint(3, 12)))
        p = os.path.join(d, f"scene_{k:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def _est_heatmaps(est, frames):
    """Resized 57-channel maps for each frame via the repo estimator
    (weight-conditioning input only — the oracle recomputes its own)."""
    out = []
    for f in frames:
        r = est.estimate_from_net_input(f["input"], scale_xy=(1.0, 1.0),
                                        nms_threshold=0.5)
        out.append(np.asarray(r.heatmap))
    return out


def _equalize_part_channels(est, heatmaps, k=12, target=0.5):
    """Scale the final heatmap-branch conv PER OUTPUT CHANNEL so every part
    channel's (k+1)-th largest local max sits near `target`.  A seeded net
    otherwise concentrates peaks in a couple of channels; the calibrated
    threshold then zeroes the rest and connect finds no >=3-part subsets.
    Per-channel scaling of a final 1x1 conv is linear, so parity is
    unaffected (both sides load the rescaled weights)."""
    import jax.numpy as jnp

    producers = {t: lv for lv in est.net.layer_views for t in lv.top}
    concat_lv = producers[est.heatmap_blob if est.lowres_blob is None
                          else est.lowres_blob]
    l2_top = concat_lv.bottom[0]  # heatmap branch = first concat input
    lname = producers[l2_top].name
    W, b = [np.asarray(p) for p in est.net.params[lname]]
    nch = b.shape[0]
    scales = np.ones(nch, np.float32)
    for c in range(est.num_parts):
        v = np.sort(np.concatenate(
            [_peak_values(h[c : c + 1])[0] for h in heatmaps]))
        vk = v[-k - 1] if v.size > k else (v[-1] if v.size else 0.0)
        if vk > 1e-6:
            scales[c] = target / vk
    if W.shape[-1] == nch:  # HWIO layout
        W = W * scales
    else:  # OIHW
        W = W * scales.reshape(-1, 1, 1, 1)
    est.net.params[lname] = [jnp.asarray(W), jnp.asarray(b * scales)]


def _parse_bodies(path):
    with open(path) as f:
        d = json.load(f)
    assert d["version"] == 0.1
    return [np.asarray(b["joints"], np.float64).reshape(-1, 3)
            for b in d["bodies"]]


def _assert_json_parity(ours_path, ref_path, num_parts):
    """BASELINE.md criterion, measured pixels-to-JSON: same people; every
    joint within 1 px / 0.01 conf (original coords).  Plus the format
    roundtrip: our CLI file must be byte-identical to re-serializing its
    own parsed values through write_json_file (reference writer layout,
    rtpose.cpp:1383-1416)."""
    from caffe_rtpose_tpu.pipeline.runner import write_json_file

    ours = _parse_bodies(ours_path)
    ref = _parse_bodies(ref_path)
    assert len(ours) == len(ref), (ours_path, len(ours), len(ref))
    for a, b in zip(ours, ref):
        present = (a[:, 2] > 0) | (b[:, 2] > 0)
        np.testing.assert_allclose(a[present, :2], b[present, :2], atol=1.0)
        np.testing.assert_allclose(a[:, 2], b[:, 2], atol=0.01)
    rt = ours_path + ".roundtrip"
    joints = (np.stack(ours) if ours
              else np.zeros((0, num_parts, 3), np.float64))
    write_json_file(rt, joints, len(ours), 1.0, num_parts)
    assert open(ours_path, "rb").read() == open(rt, "rb").read(), \
        "CLI JSON does not match the reference writer byte layout"


class Chain:
    """Per-configuration oracle artifacts shared by the tests."""

    def __init__(self, est, model, img_dir, image_paths, frames, thr):
        self.est = est
        self.model = model
        self.img_dir = img_dir
        self.image_paths = image_paths
        self.frames = frames  # list of dicts: input, canvas, scale, heatmap
        self.thr = thr


def _run_producer(oracles, tmp, image_paths, num_scales, start_scale,
                  scale_gap):
    lst = os.path.join(tmp, "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(image_paths) + "\n")
    prefix = os.path.join(tmp, "prod")
    r = subprocess.run(
        [oracles["producer"], lst, str(DISP_W), str(DISP_H), str(NET_W),
         str(NET_H), str(num_scales), repr(start_scale), repr(scale_gap),
         prefix],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    frames = []
    for line in r.stdout.splitlines():
        t = line.split()
        if t and t[0] == "frame":
            k = int(t[1])
            frames.append({
                "vfn": k,
                "scale": float(t[3]),
                "ori": (int(t[5]), int(t[6])),
                "input": np.fromfile(
                    f"{prefix}.{k:06d}.input.raw", np.float32
                ).reshape(num_scales, 3, NET_H, NET_W),
                "canvas": np.fromfile(
                    f"{prefix}.{k:06d}.canvas.raw", np.float32
                ).reshape(3, DISP_H, DISP_W),
            })
    assert len(frames) == len(image_paths)
    return frames


def _run_cnn_and_imresize(oracles, tmp, proto_src, model, frames,
                          num_scales, start_scale, scale_gap):
    proto = os.path.join(tmp, "trunc.prototxt")
    _truncated_proto(proto_src, proto, num_scales, NET_H, NET_W)
    for f in frames:
        raw = os.path.join(tmp, f"in_{f['vfn']}.raw")
        f["input"].astype(np.float32).tofile(raw)
        prefix = os.path.join(tmp, f"cnn_{f['vfn']}")
        r = subprocess.run(
            [oracles["cnn"], proto, model, raw, prefix, "concat_stage7"],
            capture_output=True, text=True, timeout=3600,
        )
        assert r.returncode == 0, r.stderr[-500:]
        shape = tuple(int(v) for v in r.stdout.split()[1:])
        concat = np.fromfile(
            prefix + ".concat_stage7.raw", np.float32).reshape(shape)
        s, c_all, h8, w8 = concat.shape
        cin = os.path.join(tmp, f"concat_{f['vfn']}.raw")
        concat.tofile(cin)
        hm_path = os.path.join(tmp, f"resized_{f['vfn']}.raw")
        r = subprocess.run(
            [oracles["gpu"], "imresize", cin, hm_path, str(s), str(c_all),
             str(h8), str(w8), "8", "0", "0", repr(start_scale),
             repr(scale_gap)],
            capture_output=True, text=True, timeout=3600,
        )
        assert r.returncode == 0, r.stderr[-500:]
        f["heatmap"] = np.fromfile(hm_path, np.float32).reshape(
            c_all, NET_H, NET_W)


def _oracle_joints(oracles, tmp, mode, f, est, thr, inter_thr,
                   inter_min_above, min_cnt, min_score):
    """GPU NMS + greedy connect on one frame's oracle heatmap."""
    num_parts, max_peaks = est.num_parts, est.max_peaks
    c_all = f["heatmap"].shape[0]
    hm_path = os.path.join(tmp, f"hm_{f['vfn']}.raw")
    f["heatmap"].tofile(hm_path)
    pk_path = os.path.join(tmp, f"pk_{f['vfn']}.raw")
    r = subprocess.run(
        [oracles["gpu"], "nms", hm_path, pk_path, "1", str(c_all),
         str(NET_H), str(NET_W), str(num_parts), str(max_peaks), repr(thr)],
        capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    peaks = np.fromfile(pk_path, np.float32).reshape(num_parts, max_peaks + 1, 3)
    assert peaks[:, 0, 0].max() <= max_peaks, "calibration failed"
    out_path = os.path.join(tmp, f"joints_{f['vfn']}.raw")
    r = subprocess.run(
        [oracles["connect"], mode, hm_path, pk_path, str(est.max_peaks),
         str(NET_W), str(NET_H), str(DISP_W), str(DISP_H),
         repr(inter_thr), str(inter_min_above), str(min_cnt),
         repr(min_score), out_path],
        capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stderr[-800:]
    blob = open(out_path, "rb").read()
    (cnt,) = struct.unpack("<i", blob[:4])
    joints = np.frombuffer(blob[4:], np.float32).reshape(
        cnt, est.num_parts, 3)
    return cnt, joints


@pytest.fixture(scope="session")
def coco_chain(oracles, tmp_path_factory):
    """Seeded COCO estimator + oracle producer/CNN/imresize artifacts for
    the single-scale 2-image configuration (shared across the tests)."""
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    tmp = str(tmp_path_factory.mktemp("image_e2e"))
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    image_paths = _make_images(img_dir, seed=31)

    est = PoseEstimator(
        COCO_PROTO, net_resolution=(NET_W, NET_H), num_scales=1, seed=31,
        keep_heatmap=True)
    rs = np.random.RandomState(31)
    reseed_weights(est, rs)

    frames = _run_producer(oracles, tmp, image_paths, 1, 1.0, 0.3)
    normalize_branches(est, frames[0]["input"])
    _equalize_part_channels(est, _est_heatmaps(est, frames))
    model = os.path.join(tmp, "seeded.caffemodel")
    est.net.save_caffemodel(model)

    _run_cnn_and_imresize(oracles, tmp, COCO_PROTO, model, frames, 1, 1.0, 0.3)
    # ONE threshold for the whole run (the pipeline has a single tunable),
    # calibrated across every frame's heatmap; need=10 keeps the greedy
    # candidate sets small (no near-tie pair scores, see module docstring)
    thr = _calibrate_threshold(
        np.concatenate([f["heatmap"][: est.num_parts] for f in frames]),
        est.max_peaks, need=10)
    return Chain(est, model, img_dir, image_paths, frames, thr)


def test_producer_preprocess_parity(oracles, coco_chain, monkeypatch):
    """pose/preprocess.py == the EXECUTED reference producer, float-exact,
    from the image file (imread -> warp -> per-scale AREA -> pad/normalize),
    including the display canvas and the f32-narrowed frame scale."""
    import cv2

    monkeypatch.setenv("CRT_NATIVE_WARP", "1")
    from caffe_rtpose_tpu.pose.preprocess import preprocess_frame

    for path, f in zip(coco_chain.image_paths, coco_chain.frames):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        pf = preprocess_frame(img, NET_W, NET_H, disp_w=DISP_W, disp_h=DISP_H,
                              num_scales=1)
        np.testing.assert_array_equal(np.asarray(pf.net_input), f["input"])
        np.testing.assert_array_equal(
            pf.display.astype(np.float32).transpose(2, 0, 1), f["canvas"])
        assert np.float32(pf.scale) == np.float32(f["scale"])
        assert (pf.ori_width, pf.ori_height) == f["ori"]


def test_cli_json_byte_parity(oracles, coco_chain, tmp_path):
    """`rtpose --image_dir --write_json` emits byte-identical JSON to the
    executed-reference chain (producer -> CNN -> GPU kernels -> connect ->
    writer) on multi-blob scenes, 2 images, COCO single-scale."""
    from caffe_rtpose_tpu.pipeline.runner import write_json_file

    ch = coco_chain
    pc = ch.est.params_connect
    ref_dir = tmp_path / "ref_json"
    ref_dir.mkdir()
    total_people = 0
    for f in ch.frames:
        cnt, joints = _oracle_joints(
            oracles, str(tmp_path), "coco", f, ch.est, ch.thr,
            pc.inter_threshold, pc.inter_min_above_threshold,
            pc.min_subset_cnt, pc.min_subset_score)
        total_people += cnt
        stem = os.path.splitext(
            os.path.basename(ch.image_paths[f["vfn"]]))[0]
        write_json_file(str(ref_dir / f"{stem}.json"), joints, cnt,
                        f["scale"], ch.est.num_parts)
    assert total_people > 0, "seeded scene produced no people"

    ours_dir = tmp_path / "ours_json"
    env = dict(os.environ, CRT_NATIVE_WARP="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "caffe_rtpose_tpu", "rtpose",
         "--image_dir", ch.img_dir, "--write_json", str(ours_dir),
         "--no_display", "--dtype", "float32",
         "--caffemodel", ch.model, "--caffeproto", COCO_PROTO,
         "--net_resolution", f"{NET_W}x{NET_H}",
         "--resolution", f"{DISP_W}x{DISP_H}",
         "--nms_threshold", repr(ch.thr)],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-500:], r.stderr[-2000:])
    for p in ch.image_paths:
        stem = os.path.splitext(os.path.basename(p))[0] + ".json"
        _assert_json_parity(str(ours_dir / stem), str(ref_dir / stem),
                            ch.est.num_parts)


def test_keyboard_tuned_thresholds_parity(oracles, coco_chain, tmp_path,
                                          monkeypatch):
    """Keyboard tuning (=/]/' -> nms/inter/min_subset_cnt) flows into the
    live pipeline and still matches the reference chain run with the same
    tuned values (handleKey, rtpose.cpp:1617-1651)."""
    from caffe_rtpose_tpu.pipeline.runner import (
        PipelineConfig, RtPosePipeline, handle_key, write_json_file)

    ch = coco_chain
    pc = ch.est.params_connect
    monkeypatch.setenv("CRT_NATIVE_WARP", "1")

    ours_dir = tmp_path / "ours_json"
    ours_dir.mkdir()
    cfg = PipelineConfig(
        image_dir=ch.img_dir, write_json=str(ours_dir), no_display=True,
        net_resolution=(NET_W, NET_H), resolution=(DISP_W, DISP_H),
        num_scales=1, nms_threshold=ch.thr,
    )
    pipe = RtPosePipeline(ch.est, cfg)
    for c in (ord("="), ord("="), ord("]"), ord("'")):
        handle_key(pipe.ui, c, has_video=False)
    assert pipe.ui.nms_threshold == pytest.approx(ch.thr + 0.01)
    assert pipe.ui.min_subset_cnt == pc.min_subset_cnt + 1
    pipe.run()

    ref_dir = tmp_path / "ref_json"
    ref_dir.mkdir()
    for f in ch.frames:
        cnt, joints = _oracle_joints(
            oracles, str(tmp_path), "coco", f, ch.est,
            pipe.ui.nms_threshold, pipe.ui.inter_threshold,
            pipe.ui.inter_min_above_threshold, pipe.ui.min_subset_cnt,
            pipe.ui.min_subset_score)
        stem = os.path.splitext(
            os.path.basename(ch.image_paths[f["vfn"]]))[0]
        write_json_file(str(ref_dir / f"{stem}.json"), joints, cnt,
                        f["scale"], ch.est.num_parts)

    for p in ch.image_paths:
        stem = os.path.splitext(os.path.basename(p))[0] + ".json"
        _assert_json_parity(str(ours_dir / stem), str(ref_dir / stem),
                            ch.est.num_parts)


def test_cli_json_byte_parity_three_scale_mpi(oracles, tmp_path):
    """The same pixels-to-JSON chain on the OTHER axes: MPI descriptor
    (15 parts, max_peaks=20, connectLimbs) x 3 scales (per-scale AREA
    resize loop + fused ImResize averaging), 1 image."""
    from caffe_rtpose_tpu.pipeline.runner import write_json_file
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    mpi_proto = f"{REF}/model/mpi/pose_deploy_linevec.prototxt"
    tmp = str(tmp_path)
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    # seed chosen so the equalized scene assembles people under MPI's
    # stricter connect params (min_cnt 3 of 15 parts, inter_thr 0.01):
    # most seeds yield zero >=3-part subsets and a vacuous parity check
    image_paths = _make_images(img_dir, seed=40)[:1]

    est = PoseEstimator(
        mpi_proto, net_resolution=(NET_W, NET_H), num_scales=3,
        start_scale=1.0, scale_gap=0.3, seed=40, keep_heatmap=True)
    rs = np.random.RandomState(40)
    reseed_weights(est, rs)

    frames = _run_producer(oracles, tmp, image_paths, 3, 1.0, 0.3)
    normalize_branches(est, frames[0]["input"])
    _equalize_part_channels(est, _est_heatmaps(est, frames))
    model = os.path.join(tmp, "seeded.caffemodel")
    est.net.save_caffemodel(model)

    _run_cnn_and_imresize(oracles, tmp, mpi_proto, model, frames, 3, 1.0, 0.3)
    thr = _calibrate_threshold(
        np.concatenate([f["heatmap"][: est.num_parts] for f in frames]),
        est.max_peaks, need=10)

    pc = est.params_connect
    ref_dir = tmp_path / "ref_json"
    ref_dir.mkdir()
    total_people = 0
    for f in frames:
        cnt, joints = _oracle_joints(
            oracles, tmp, "mpi", f, est, thr,
            pc.inter_threshold, pc.inter_min_above_threshold,
            pc.min_subset_cnt, pc.min_subset_score)
        total_people += cnt
        stem = os.path.splitext(os.path.basename(image_paths[f["vfn"]]))[0]
        write_json_file(str(ref_dir / f"{stem}.json"), joints, cnt,
                        f["scale"], est.num_parts)
    assert total_people > 0, "seeded scene produced no people"

    ours_dir = tmp_path / "ours_json"
    env = dict(os.environ, CRT_NATIVE_WARP="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "caffe_rtpose_tpu", "rtpose",
         "--image_dir", img_dir, "--write_json", str(ours_dir),
         "--no_display", "--dtype", "float32",
         "--caffemodel", model, "--caffeproto", mpi_proto,
         "--net_resolution", f"{NET_W}x{NET_H}",
         "--resolution", f"{DISP_W}x{DISP_H}",
         "--num_scales", "3", "--start_scale", "1.0", "--scale_gap", "0.3",
         "--nms_threshold", repr(thr)],
        capture_output=True, text=True, timeout=1800, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-500:], r.stderr[-2000:])
    for p in image_paths:
        stem = os.path.splitext(os.path.basename(p))[0] + ".json"
        _assert_json_parity(str(ours_dir / stem), str(ref_dir / stem),
                            est.num_parts)
