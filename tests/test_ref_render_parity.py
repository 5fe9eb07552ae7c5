"""Pixel parity vs the reference's EXECUTED render kernels.

Until round 4 pose/render.py was verified only by "pixels changed" smoke
tests — the reference's render sources (src/rtpose/renderFunctions.cu, the
ONLY render implementation it has; there is no CPU fallback) had never been
run.  These tests close that loop: native/ref_oracle/build_render.sh
compiles renderFunctions.cu UNMODIFIED (apart from cu_preprocess.py's
purely syntactic ``<<<>>>`` launch rewrite) against the cuda_emu host shim
and the resulting ``render_oracle`` binary executes the same host wrappers
rtpose.cpp's render() calls (examples/rtpose/rtpose.cpp:271-301):
render_mpi_parts, render_coco_parts, render_coco_aff.

Reference quirks exercised and replicated:
- All host wrappers launch with grid and block SWAPPED
  (``<<<threadsPerBlock, numBlocks>>>``, renderFunctions.cu:362/1009/1067).
  Coverage is unaffected (the products match), but the per-block thread
  count becomes updiv(w,32)*updiv(h,32), which bounds how many shared-pose
  entries get loaded (render_pose_29parts:135 loads one PART per thread,
  render_pose_coco_parts:412 one PERSON per thread).  Canvas sizes below
  keep updiv(w,32)*updiv(h,32) >= 15*num_people so the shared load is
  complete, as it is at real display resolutions (640x480 -> 300 threads).
- The heatmap overlay's out-of-box default value is 1 only for
  part == NUM_PARTS-1 (:659/:259), not for the background channel.
- The COCO heatmap and the PAF overlays blend getColor/getColorXY's output
  with B and R swapped (b <- c[2], :715/:965); the MPI heatmap (:320) and
  the all-parts overlay (:827) do not.
- render_pose_coco_heatmap2 calls __saturatef and DISCARDS the result
  (:817), so part values are accumulated unclamped.
- Googly-eye mode REPLACES the normal circles of parts 14/15 (:588).

Tolerances: the JAX port computes the same f32 arithmetic but through XLA's
sin/cos/atan2 and a matmul-form bicubic, so isolated boundary pixels (an
ellipse edge where judge ~ 1, a colormap breakpoint) may flip.  Parity is
asserted as: >= 99.9% of pixels within 0.5/255 grey levels per channel.
"""

import os
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_rtpose_tpu.pose import render as R  # noqa: E402

REF = "/root/reference"
BUILD = "/tmp/ref_oracle_build"
ORACLE = os.path.join(BUILD, "render_oracle")
HERE = os.path.dirname(__file__)
BUILD_SH = os.path.join(HERE, "..", "native", "ref_oracle", "build_render.sh")


@pytest.fixture(scope="session")
def render_oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    r = subprocess.run(
        ["bash", BUILD_SH, BUILD], capture_output=True, text=True
    )
    if r.returncode != 0 or not os.path.exists(ORACLE):
        pytest.skip(f"render_oracle build failed: {r.stderr[-500:]}")
    return ORACLE


def _run_oracle(oracle, tmp_path, mode, canvas_hwc, poses, heat, last_arg,
                boxsize=368):
    """canvas_hwc: (h, w, 3) BGR interleaved; converts to/from the
    reference's planar layout."""
    h, w, _ = canvas_hwc.shape
    c, h_net, w_net = heat.shape
    np_people = poses.shape[0]
    planar = np.ascontiguousarray(canvas_hwc.transpose(2, 0, 1), np.float32)
    fc, fp, fh, fo = (tmp_path / n for n in
                      ("c.raw", "p.raw", "h.raw", "o.raw"))
    planar.tofile(fc)
    np.ascontiguousarray(poses, np.float32).tofile(fp)
    np.ascontiguousarray(heat, np.float32).tofile(fh)
    r = subprocess.run(
        [oracle, mode, str(fc), str(fp), str(fh), str(fo), str(w), str(h),
         str(w_net), str(h_net), str(c), str(boxsize), str(np_people),
         str(last_arg)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    out = np.fromfile(fo, np.float32).reshape(3, h, w)
    return out.transpose(1, 2, 0)


def assert_pixel_parity(mine, ref, frac=0.999, atol=0.5, ctx="",
                        outlier_cap=2.0):
    """Pixel parity with a bounded escape hatch: >= `frac` of pixels must be
    within `atol`, AND any remaining outliers (float-rounding disagreements
    on anti-aliased feature edges) must each stay under `outlier_cap` of 255.
    The cap keeps a localized transcription error — a wrong ellipse quadrant,
    a flipped colormap breakpoint — from hiding inside the <=0.1% allowance:
    those produce full-swing (~alpha*255 ~ 150+) diffs.  Measured reality
    (CRT_RENDER_DIFF_STATS=1, all 20 cases): max diff 0.000 — the suite is
    bit-exact against the executed reference kernels today, so the hatch
    exists only for cross-platform float drift and is capped at +-2
    intensity levels."""
    mine = np.asarray(mine, np.float32)
    diff = np.abs(mine - ref)
    bad = (diff > atol).any(axis=-1)
    ok = 1.0 - bad.mean()
    if os.environ.get("CRT_RENDER_DIFF_STATS"):
        print(f"DIFFSTATS {ctx}: ok={ok:.6f} bad={int(bad.sum())} "
              f"max={diff.max():.3f}")
    assert ok >= frac, (
        f"{ctx}: only {ok:.5f} of pixels within {atol} "
        f"(max diff {diff.max():.3f}, {bad.sum()} bad pixels)"
    )
    assert diff.max() <= outlier_cap, (
        f"{ctx}: outlier pixels exceed the magnitude cap "
        f"(max diff {diff.max():.3f} > {outlier_cap}, {bad.sum()} bad pixels)"
    )


def _scene(seed, n_people, num_parts, h, w, spread=1.0, vis=0.9):
    """Seeded random pose scene; spread < 1 shrinks extents to force the
    COCO size-adaptive (scalef < 1) branch."""
    rng = np.random.default_rng(seed)
    poses = np.zeros((n_people, num_parts, 3), np.float32)
    for p in range(n_people):
        cx = rng.uniform(0.25 * w, 0.75 * w)
        cy = rng.uniform(0.25 * h, 0.75 * h)
        ext_x = spread * w * 0.3
        ext_y = spread * h * 0.35
        poses[p, :, 0] = np.clip(
            rng.normal(cx, ext_x / 2, num_parts), -10, w + 10)
        poses[p, :, 1] = np.clip(
            rng.normal(cy, ext_y / 2, num_parts), -10, h + 10)
        poses[p, :, 2] = np.where(
            rng.uniform(size=num_parts) < vis,
            rng.uniform(0.05, 1.0, num_parts), 0.0)
    canvas = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    return canvas, poses


# canvas sizes keep updiv(w,32)*updiv(h,32) >= 15*num_people (see module
# docstring); 256x224 -> 8*7 = 56 block threads
H, W = 224, 256


class TestCocoPose:
    @pytest.mark.parametrize("seed,n_people,spread", [
        (0, 3, 1.0),      # large poses, scalef == 1
        (1, 2, 0.25),     # small poses, scalef < 1 (size-adaptive branch)
        (2, 1, 0.05),     # tiny pose, scalef floor 0.33
        (3, 3, 1.0),
    ])
    def test_pose(self, render_oracle, tmp_path, seed, n_people, spread):
        canvas, poses = _scene(seed, n_people, 18, H, W, spread)
        ref = _run_oracle(render_oracle, tmp_path, "coco", canvas, poses,
                          np.zeros((1, 8, 8), np.float32), last_arg=0)
        maxp = poses.shape[0]
        mine = R.render_pose(jnp.asarray(canvas), jnp.asarray(poses),
                             jnp.int32(maxp), num_parts=18, threshold=0.01)
        assert_pixel_parity(mine, ref, ctx=f"coco pose seed={seed}")

    def test_pose_coincident_endpoints(self, render_oracle, tmp_path):
        """A limb with x_a == x_b, y_a == y_b divides by zero in the kernel
        (judge = inf/nan -> never drawn); the port must do the same."""
        canvas, poses = _scene(7, 2, 18, H, W)
        poses[0, 2, :2] = poses[0, 1, :2]  # limb (1,2) coincident
        poses[0, 1, 2] = poses[0, 2, 2] = 0.9
        ref = _run_oracle(render_oracle, tmp_path, "coco", canvas, poses,
                          np.zeros((1, 8, 8), np.float32), last_arg=0)
        mine = R.render_pose(jnp.asarray(canvas), jnp.asarray(poses),
                             jnp.int32(2), num_parts=18, threshold=0.01)
        assert_pixel_parity(mine, ref, ctx="coco coincident")

    def test_pose_googly(self, render_oracle, tmp_path):
        canvas, poses = _scene(4, 2, 18, H, W)
        poses[:, 14, 2] = poses[:, 15, 2] = 0.9  # eyes visible
        ref = _run_oracle(render_oracle, tmp_path, "coco", canvas, poses,
                          np.zeros((1, 8, 8), np.float32),
                          last_arg=1)  # part 0, googly=1 (packed part*10+g)
        mine = R.render_pose(jnp.asarray(canvas), jnp.asarray(poses),
                             jnp.int32(2), num_parts=18, threshold=0.01,
                             googly_eyes=True)
        assert_pixel_parity(mine, ref, ctx="coco googly")

    def test_pose_nobody_visible(self, render_oracle, tmp_path):
        """All scores zero: bbox degenerates to [w-50..50] etc."""
        canvas, poses = _scene(5, 2, 18, H, W)
        poses[:, :, 2] = 0.0
        ref = _run_oracle(render_oracle, tmp_path, "coco", canvas, poses,
                          np.zeros((1, 8, 8), np.float32), last_arg=0)
        mine = R.render_pose(jnp.asarray(canvas), jnp.asarray(poses),
                             jnp.int32(2), num_parts=18, threshold=0.01)
        assert_pixel_parity(mine, ref, ctx="coco invisible")


class TestCocoHeatmap:
    def _heat(self, seed, c=57, h_net=28, w_net=32):
        rng = np.random.default_rng(seed)
        heat = rng.uniform(-0.2, 1.1, (c, h_net, w_net)).astype(np.float32)
        heat[19:] = rng.uniform(-1, 1, (c - 19, h_net, w_net))
        return heat

    @pytest.mark.parametrize("part", [0, 5, 17])
    def test_single_part(self, render_oracle, tmp_path, part):
        canvas, _ = _scene(10 + part, 1, 18, H, W)
        heat = self._heat(20 + part)
        # render_coco_parts part_to_show = part+1 -> heatmap channel `part`
        ref = _run_oracle(render_oracle, tmp_path, "coco", canvas,
                          np.zeros((1, 18, 3), np.float32), heat,
                          last_arg=(part + 1) * 10)
        mine = R.render_heatmap(jnp.asarray(canvas), jnp.asarray(heat),
                                part, num_parts=18)
        assert_pixel_parity(mine, ref, ctx=f"coco heatmap part={part}")

    def test_all_parts(self, render_oracle, tmp_path):
        """part_to_show = 19 -> render_pose_coco_heatmap2 (in_part 0)."""
        canvas, _ = _scene(30, 1, 18, H, W)
        heat = self._heat(31)
        ref = _run_oracle(render_oracle, tmp_path, "coco", canvas,
                          np.zeros((1, 18, 3), np.float32), heat,
                          last_arg=19 * 10)
        mine = R.render_all_parts(jnp.asarray(canvas), jnp.asarray(heat),
                                  num_parts=18)
        assert_pixel_parity(mine, ref, ctx="coco all-parts")


class TestCocoAffinity:
    def _heat(self, seed, c=57, h_net=28, w_net=32):
        rng = np.random.default_rng(seed)
        return rng.uniform(-1, 1, (c, h_net, w_net)).astype(np.float32)

    @pytest.mark.parametrize("aff_part", [19, 21, 55])
    def test_single_pair(self, render_oracle, tmp_path, aff_part):
        canvas, _ = _scene(40 + aff_part, 1, 18, H, W)
        heat = self._heat(50 + aff_part)
        ref = _run_oracle(render_oracle, tmp_path, "aff", canvas,
                          np.zeros((1, 18, 3), np.float32), heat,
                          last_arg=aff_part * 100 + 1)
        mine = R.render_paf(jnp.asarray(canvas), jnp.asarray(heat),
                            aff_part, num_parts_accum=1)
        assert_pixel_parity(mine, ref, ctx=f"coco paf part={aff_part}")

    def test_accumulated(self, render_oracle, tmp_path):
        """part_to_show = 20 -> all 19 PAF pairs accumulated from ch 19
        (rtpose.cpp:288-295)."""
        canvas, _ = _scene(60, 1, 18, H, W)
        heat = self._heat(61)
        ref = _run_oracle(render_oracle, tmp_path, "aff", canvas,
                          np.zeros((1, 18, 3), np.float32), heat,
                          last_arg=19 * 100 + 19)
        mine = R.render_paf(jnp.asarray(canvas), jnp.asarray(heat),
                            19, num_parts_accum=19)
        assert_pixel_parity(mine, ref, ctx="coco paf accumulated")


class TestMpi:
    def test_pose(self, render_oracle, tmp_path):
        canvas, poses = _scene(70, 3, 15, H, W)
        ref = _run_oracle(render_oracle, tmp_path, "mpi", canvas, poses,
                          np.zeros((1, 8, 8), np.float32), last_arg=0)
        mine = R.render_pose_mpi(jnp.asarray(canvas), jnp.asarray(poses),
                                 jnp.int32(3))
        assert_pixel_parity(mine, ref, ctx="mpi pose")

    def test_pose_head_ring(self, render_oracle, tmp_path):
        """The l==0 head limb renders as a ring (judge in [0.8, 1])."""
        canvas, poses = _scene(71, 1, 15, H, W)
        poses[0, 0, :] = (W * 0.5, H * 0.3, 0.9)
        poses[0, 1, :] = (W * 0.5, H * 0.55, 0.9)
        ref = _run_oracle(render_oracle, tmp_path, "mpi", canvas, poses,
                          np.zeros((1, 8, 8), np.float32), last_arg=0)
        mine = R.render_pose_mpi(jnp.asarray(canvas), jnp.asarray(poses),
                                 jnp.int32(1))
        assert_pixel_parity(mine, ref, ctx="mpi head ring")

    @pytest.mark.parametrize("part", [0, 7, 14])
    def test_heatmap(self, render_oracle, tmp_path, part):
        canvas, _ = _scene(80 + part, 1, 15, H, W)
        rng = np.random.default_rng(90 + part)
        heat = rng.uniform(-0.2, 1.1, (44, 28, 32)).astype(np.float32)
        ref = _run_oracle(render_oracle, tmp_path, "mpi", canvas,
                          np.zeros((1, 15, 3), np.float32), heat,
                          last_arg=part + 1)
        mine = R.render_heatmap(jnp.asarray(canvas), jnp.asarray(heat),
                                part, num_parts=15)
        assert_pixel_parity(mine, ref, ctx=f"mpi heatmap part={part}")
