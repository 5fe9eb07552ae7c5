"""ImResize and NMS kernels vs direct numpy re-implementations of the
reference CUDA semantics (imresize_layer.cu:98-155, nms_layer.cu:15-113)."""

import numpy as np
import pytest

import jax.numpy as jnp

from caffe_rtpose_tpu.ops.imresize import imresize_average
from caffe_rtpose_tpu.ops.nms import nms_peaks


def _cubic(v0, v1, v2, v3, dx):
    return (
        (-0.5 * v0 + 1.5 * v1 - 1.5 * v2 + 0.5 * v3) * dx * dx * dx
        + (v0 - 2.5 * v1 + 2.0 * v2 - 0.5 * v3) * dx * dx
        + (-0.5 * v0 + 0.5 * v2) * dx
        + v1
    )


def imresize_ref(src, th, tw, start_scale, scale_gap):
    """Direct per-pixel translation of imresize_cubic_kernel (float64 math)."""
    num, H, W = src.shape
    out = np.zeros((th, tw), np.float64)
    for y in range(th):
        for x in range(tw):
            total = 0.0
            for n in range(num):
                padw = int(np.floor(W / 2 * (1 - start_scale + n * scale_gap)))
                padh = int(np.floor(H / 2 * (1 - start_scale + n * scale_gap)))
                ow = W - 2 * padw
                oh = H - 2 * padh
                sp = src[n]
                offset_x = tw / float(ow) / 2 - 0.5
                offset_y = th / float(oh) / 2 - 0.5
                x_on = (x - offset_x) * (float(ow) / tw)
                y_on = (y - offset_y) * (float(oh) / th)
                x1 = int(x_on + 1e-5)  # C trunc
                x1 = max(x1, 0)
                x0 = (x1 if x1 - 1 < 0 else x1 - 1) + padw
                x2 = ow - 1 if x1 + 1 >= ow else x1 + 1
                x3 = (ow - 1 if x2 + 1 >= ow else x2 + 1) + padw
                dx = x_on - x1
                x1p, x2p = x1 + padw, x2 + padw
                y1 = int(y_on + 1e-5)
                y1 = max(y1, 0)
                y0 = (y1 if y1 - 1 < 0 else y1 - 1) + padh
                y2 = oh - 1 if y1 + 1 >= oh else y1 + 1
                y3 = (oh - 1 if y2 + 1 >= oh else y2 + 1) + padh
                dy = y_on - y1
                y1p, y2p = y1 + padh, y2 + padh
                temp = [
                    _cubic(sp[yy, x0], sp[yy, x1p], sp[yy, x2p], sp[yy, x3], dx)
                    for yy in (y0, y1p, y2p, y3)
                ]
                total += _cubic(temp[0], temp[1], temp[2], temp[3], dy)
            out[y, x] = total / num
    return out


@pytest.mark.parametrize("scales,start,gap", [(1, 1.0, 0.3), (2, 1.0, 0.3), (3, 1.0, 0.15)])
def test_imresize_matches_reference_semantics(scales, start, gap):
    rs = np.random.RandomState(0)
    H, W, f = 6, 10, 8
    src = rs.rand(scales, H, W).astype(np.float32)
    ref = imresize_ref(src.astype(np.float64), H * f, W * f, start, gap)
    x = jnp.asarray(src[..., None])  # (S, H, W, 1)
    got = np.asarray(imresize_average(x, H * f, W * f, start, gap))[0, :, :, 0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_imresize_multichannel_batch1_output():
    rs = np.random.RandomState(1)
    src = rs.rand(2, 4, 5, 7).astype(np.float32)  # (S,H,W,C)
    out = imresize_average(jnp.asarray(src), 32, 40, 1.0, 0.3)
    assert out.shape == (1, 32, 40, 7)


def nms_ref(heat, threshold, max_peaks):
    """Direct translation of nms_register_kernel + writeResultKernel."""
    C, H, W = heat.shape
    out = np.zeros((C, max_peaks + 1, 3), np.float32)
    for c in range(C):
        peaks = []
        for y in range(1, H - 1):
            for x in range(1, W - 1):
                v = heat[c, y, x]
                if v <= threshold:
                    continue
                neigh = heat[c, y - 1 : y + 2, x - 1 : x + 2].copy()
                neigh[1, 1] = -np.inf
                if np.all(v > neigh):
                    peaks.append((y, x))
        out[c, 0, 0] = min(len(peaks), max_peaks)
        for i, (py, px) in enumerate(peaks[:max_peaks]):
            x_acc = y_acc = s_acc = 0.0
            for dy in range(-3, 4):
                if not (0 < py + dy < W):  # reference quirk: width bound for y
                    continue
                if py + dy >= H:
                    continue  # our safety clamp
                for dx in range(-3, 4):
                    if not (0 < px + dx < W):
                        continue
                    s = heat[c, py + dy, px + dx]
                    if s > 0:
                        x_acc += (px + dx) * s
                        y_acc += (py + dy) * s
                        s_acc += s
            out[c, i + 1] = (x_acc / s_acc, y_acc / s_acc, heat[c, py, px])
    return out


def _gaussian_heat(rs, C, H, W, n_blobs):
    heat = np.zeros((C, H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for c in range(C):
        for _ in range(n_blobs):
            cy, cx = rs.randint(5, H - 5), rs.randint(5, W - 5)
            amp = 0.3 + 0.7 * rs.rand()
            heat[c] += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0 ** 2))
    return np.clip(heat, 0, 1)


def test_nms_matches_reference_semantics():
    rs = np.random.RandomState(2)
    heat = _gaussian_heat(rs, 3, 40, 56, 4)
    ref = nms_ref(heat, 0.05, 16)
    got = np.asarray(nms_peaks(jnp.asarray(heat), 0.05, 16))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_nms_noise_field():
    rs = np.random.RandomState(3)
    heat = rs.rand(2, 24, 30).astype(np.float32)
    ref = nms_ref(heat, 0.5, 8)
    got = np.asarray(nms_peaks(jnp.asarray(heat), 0.5, 8))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_nms_count_capped_and_order():
    rs = np.random.RandomState(4)
    heat = rs.rand(1, 32, 32).astype(np.float32)
    got = np.asarray(nms_peaks(jnp.asarray(heat), 0.1, 4))
    ref = nms_ref(heat, 0.1, 4)
    # raster order: first 4 peaks in scan order
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    assert got[0, 0, 0] == 4


def test_nms_traced_threshold():
    heat = np.zeros((1, 16, 16), np.float32)
    heat[0, 8, 8] = 0.9
    heat[0, 3, 3] = 0.2
    got_hi = np.asarray(nms_peaks(jnp.asarray(heat), jnp.float32(0.5), 4))
    got_lo = np.asarray(nms_peaks(jnp.asarray(heat), jnp.float32(0.1), 4))
    assert got_hi[0, 0, 0] == 1
    assert got_lo[0, 0, 0] == 2


class TestCpmLegacy:
    """Crop-around-peak helpers (cpm/util/math_functions.cu)."""

    def test_fill_gaussian_matches_kernel_math(self):
        import numpy as np

        from caffe_rtpose_tpu.ops.cpm_legacy import fill_gaussian

        box, sigma = 16, 5.0
        g = np.asarray(fill_gaussian(box, sigma))
        c = box / 2
        for y in (0, 7, 8, 15):
            for x in (0, 7, 8, 15):
                d2 = (x - c) ** 2 + (y - c) ** 2
                e = d2 / 2.0 / sigma / sigma
                want = 0.0 if e > 4.6052 else np.exp(-e)
                assert abs(g[y, x] - want) < 1e-6

    def test_fill_pose_net_crops_and_pads(self):
        import numpy as np

        from caffe_rtpose_tpu.ops.cpm_legacy import fill_pose_net

        rs = np.random.RandomState(0)
        img = rs.rand(3, 20, 24).astype(np.float32)
        centers = np.array([[12.0, 10.0], [0.0, 0.0]], np.float32)
        out = np.asarray(fill_pose_net(img, centers, boxsize=8, sigma=21.0))
        assert out.shape == (2, 4, 8, 8)
        # person 0 fully inside: straight crop
        np.testing.assert_allclose(out[0, :3], img[:, 6:14, 8:16], rtol=1e-6)
        # person 1 at the corner: out-of-image region zero-padded
        assert (out[1, :3, :4, :4] == 0).all()
        np.testing.assert_allclose(out[1, :3, 4:, 4:], img[:, :4, :4], rtol=1e-6)
        # gaussian channel identical across people
        np.testing.assert_allclose(out[0, 3], out[1, 3], rtol=1e-6)
