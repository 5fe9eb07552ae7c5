"""Cross-implementation parity vs the reference's EXECUTED GPU kernels.

Until round 3 the repo's NMS/ImResize parity was "our kernel vs a
hand-derived numpy oracle of what the .cu says" — the reference's actual
GPU sources (src/caffe/cpm/layers/nms_layer.cu:15-113 and
imresize_layer.cu:98-155, the paths rtpose.bin really uses; the in-tree
CPU fallbacks are documented as divergent) had never been *run*.  These
tests close that loop: native/ref_oracle/build_gpu.sh compiles the two
.cu files UNMODIFIED (apart from a purely syntactic ``<<<>>>``
launch-site rewrite, cu_preprocess.py) against a host CUDA-emulation shim
(cuda_emu.h: serial/threaded block drivers, __syncthreads barrier,
thrust::exclusive_scan) and the resulting ``gpu_oracle`` binary executes
NmsLayer::Forward_gpu / ImResizeLayer::Forward_gpu over raw tensors.

Known reference quirks and how they are handled here:
- NMS 7x7 refinement checks BOTH axes against *width* with strict > 0
  (nms_layer.cu:78-94).  Replicated by ops/nms.py; scenes below include
  peaks near the top/left borders and a tall (H > W) map so the quirk is
  exercised in both directions.
- For wide maps (W > H) a peak within 3 px of the bottom edge makes the
  reference read past the channel (y+dy < width passes but y+dy >= H) —
  an out-of-bounds bug ops/nms.py intentionally does NOT reproduce, so
  wide-map scenes keep peaks >= 4 px from the bottom edge.
- The oracle's top[0] count is uncapped while rows stop at max_peaks
  (writeResultKernel:70); ops/nms.py caps the count, so counts are
  compared after min(count, max_peaks).
- Executing the kernel surfaced a NEW reference bug: when W or H is not a
  multiple of 16, nms_register_kernel's rounded-up grid spawns phantom
  threads whose x or y is out of range yet which satisfy the border
  branch (``x==0 || x==w-1 || y==0 || y==h-1``, nms_layer.cu:43-45) and
  write ``workspace[y*w+x]`` with linearized indices that (a) spill past
  the blob (heap/VRAM overrun) and (b) alias row-1 cells of the SAME
  channel (``y==0, x in [w, ceil16(w))`` maps to row 1, cols x-w),
  racing the genuine peak bit there.  Production resolutions are always
  multiples of 16 (net res must be /16 and maps are x8), so rtpose never
  trips it; tests below use %16 == 0 dims to match production and keep
  the executed oracle deterministic (see also README divergences).
"""

import os
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/ref_oracle_build"
ORACLE = os.path.join(BUILD, "gpu_oracle")
HERE = os.path.dirname(__file__)
BUILD_SH = os.path.join(HERE, "..", "native", "ref_oracle", "build_gpu.sh")


@pytest.fixture(scope="session")
def gpu_oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    r = subprocess.run(
        ["bash", BUILD_SH, BUILD], capture_output=True, text=True
    )
    if r.returncode != 0 or not os.path.exists(ORACLE):
        pytest.skip(f"gpu_oracle build failed: {r.stderr[-500:]}")
    return ORACLE


def _run_oracle(oracle, args, in_arr, out_count, tmp_path):
    fin = tmp_path / "in.raw"
    fout = tmp_path / "out.raw"
    np.ascontiguousarray(in_arr, np.float32).tofile(fin)
    r = subprocess.run(
        [oracle] + args[:1] + [str(fin), str(fout)] + args[1:],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    out = np.fromfile(fout, np.float32)
    assert out.size == out_count, (out.size, out_count)
    return out


def _bumpy_heatmap(rs, c, h, w, n_bumps, y_max=None, sigma=2.5):
    """Smooth positive maps with isolated Gaussian bumps (peaks) plus a low
    noise floor; bump centers stay >= 2 px from top/left (so the strict->0
    window quirk is hit) and away from the bottom OOB region for wide maps.
    """
    y_hi = (h - 5) if y_max is None else y_max
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    maps = rs.rand(c, h, w).astype(np.float32) * 0.02
    for ch in range(c):
        for _ in range(n_bumps):
            cy = rs.uniform(2, y_hi)
            cx = rs.uniform(2, w - 3)
            amp = rs.uniform(0.3, 1.0)
            maps[ch] += amp * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)
            ).astype(np.float32)
    return maps


def _check_nms(oracle, tmp_path, maps, num_parts, max_peaks, threshold):
    import jax

    from caffe_rtpose_tpu.ops.nms import nms_peaks

    c, h, w = maps.shape
    ref = _run_oracle(
        oracle,
        [
            "nms",
            "1",
            str(c),
            str(h),
            str(w),
            str(num_parts),
            str(max_peaks),
            repr(threshold),
        ],
        maps,
        1 * num_parts * (max_peaks + 1) * 3,
        tmp_path,
    ).reshape(num_parts, max_peaks + 1, 3)

    ours = np.asarray(
        jax.jit(nms_peaks, static_argnums=(2, 3))(
            maps, np.float32(threshold), max_peaks, num_parts
        )
    )

    total_valid = 0
    for ch in range(num_parts):
        k = int(min(ref[ch, 0, 0], max_peaks))
        assert int(ours[ch, 0, 0]) == k, (ch, ref[ch, 0, 0], ours[ch, 0, 0])
        if k:
            np.testing.assert_allclose(
                ours[ch, 1 : k + 1], ref[ch, 1 : k + 1], rtol=1e-4, atol=2e-4
            )
        total_valid += k
    return total_valid


class TestNmsVsExecutedRefGpu:
    def test_wide_map(self, gpu_oracle, tmp_path):
        rs = np.random.RandomState(0)
        maps = _bumpy_heatmap(rs, 19, 48, 80, n_bumps=6)
        n = _check_nms(gpu_oracle, tmp_path, maps, 18, 20, 0.05)
        assert n > 40  # scene really produced peaks

    def test_tall_map_width_quirk(self, gpu_oracle, tmp_path):
        # H > W: the y-vs-width bound truncates refinement windows near
        # y ~ W without any OOB read; both sides must agree exactly.
        rs = np.random.RandomState(1)
        maps = _bumpy_heatmap(rs, 6, 96, 48, n_bumps=5, y_max=90)
        # plant bumps straddling the y == W boundary explicitly
        yy, xx = np.mgrid[0:96, 0:48].astype(np.float32)
        for ch in range(6):
            for cy in (44.0, 47.0, 49.0):
                maps[ch] += 0.8 * np.exp(
                    -((yy - cy) ** 2 + (xx - 24.0) ** 2) / (2 * 2.0**2)
                ).astype(np.float32)
        n = _check_nms(gpu_oracle, tmp_path, maps, 6, 16, 0.05)
        assert n > 10

    def test_overflow_capped_rows(self, gpu_oracle, tmp_path):
        # more peaks than max_peaks: rows stop at max_peaks, count capped
        rs = np.random.RandomState(2)
        maps = _bumpy_heatmap(rs, 4, 64, 96, n_bumps=24)
        _check_nms(gpu_oracle, tmp_path, maps, 4, 8, 0.05)

    def test_threshold_sweep(self, gpu_oracle, tmp_path):
        rs = np.random.RandomState(3)
        maps = _bumpy_heatmap(rs, 8, 48, 80, n_bumps=5)
        for thr in (0.01, 0.2, 0.6):
            _check_nms(gpu_oracle, tmp_path, maps, 8, 12, thr)

    def test_bottom_edge_channel_continuation(self, gpu_oracle, tmp_path):
        # wide map with peaks within 3 px of the bottom edge: the
        # reference's refinement window reads past the channel into
        # channel c+1 (flat pointer arithmetic); ops/nms.py replicates
        # via the extra channels of the full map
        rs = np.random.RandomState(5)
        maps = _bumpy_heatmap(rs, 7, 48, 80, n_bumps=3)
        yy, xx = np.mgrid[0:48, 0:80].astype(np.float32)
        for ch in range(7):
            for cy, cx in ((45.0, 20.0), (46.0, 50.0), (44.5, 70.0)):
                maps[ch] += 0.9 * np.exp(
                    -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.8**2)
                ).astype(np.float32)
        n = _check_nms(gpu_oracle, tmp_path, maps, 6, 16, 0.05)
        assert n > 12

    def test_fullres_coco_shape(self, gpu_oracle, tmp_path):
        # the production shape: 368x656, 18 parts, max_peaks 64
        rs = np.random.RandomState(4)
        maps = _bumpy_heatmap(rs, 19, 368, 656, n_bumps=10, sigma=5.0)
        n = _check_nms(gpu_oracle, tmp_path, maps, 18, 64, 0.05)
        assert n > 100


class TestImResizeVsExecutedRefGpu:
    def _check(self, oracle, tmp_path, src, factor, tw, th, ss, gap):
        import jax

        from caffe_rtpose_tpu.ops.imresize import imresize_average

        s, c, h, w = src.shape
        if factor:
            th, tw = h * factor, w * factor
        ref = _run_oracle(
            oracle,
            [
                "imresize",
                str(s),
                str(c),
                str(h),
                str(w),
                str(factor),
                str(tw),
                str(th),
                repr(ss),
                repr(gap),
            ],
            src,
            c * th * tw,
            tmp_path,
        ).reshape(c, th, tw)

        nhwc = np.moveaxis(src, 1, -1)  # (S, H, W, C)
        ours = np.asarray(
            jax.jit(imresize_average, static_argnums=(1, 2, 3, 4))(
                nhwc, th, tw, float(ss), float(gap)
            )
        )[0]
        ours = np.moveaxis(ours, -1, 0)  # (C, th, tw)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_single_scale_factor8(self, gpu_oracle, tmp_path):
        rs = np.random.RandomState(10)
        src = rs.rand(1, 8, 23, 41).astype(np.float32)
        self._check(gpu_oracle, tmp_path, src, 8, 0, 0, 1.0, 0.1)

    def test_three_scales_avg(self, gpu_oracle, tmp_path):
        # the multi-scale fused averaging path with per-scale pad offsets
        rs = np.random.RandomState(11)
        src = rs.rand(3, 6, 23, 41).astype(np.float32)
        self._check(gpu_oracle, tmp_path, src, 8, 0, 0, 1.0, 0.1)

    def test_mpi_scales(self, gpu_oracle, tmp_path):
        # MPI deploy config: start_scale 0.9, gap 0.1
        rs = np.random.RandomState(12)
        src = rs.rand(2, 5, 23, 41).astype(np.float32)
        self._check(gpu_oracle, tmp_path, src, 8, 0, 0, 0.9, 0.1)

    def test_explicit_target_dims(self, gpu_oracle, tmp_path):
        # factor == 0: target dims from proto (runtime setter path)
        rs = np.random.RandomState(13)
        src = rs.rand(1, 4, 20, 30).astype(np.float32)
        self._check(gpu_oracle, tmp_path, src, 0, 200, 144, 1.0, 0.1)

    def test_negative_values(self, gpu_oracle, tmp_path):
        # PAF channels are signed; make sure nothing assumes positivity
        rs = np.random.RandomState(14)
        src = (rs.rand(2, 4, 23, 41) - 0.5).astype(np.float32)
        self._check(gpu_oracle, tmp_path, src, 8, 0, 0, 1.0, 0.1)
