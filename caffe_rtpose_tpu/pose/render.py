"""Skeleton / heatmap / PAF overlay rendering, pixel-parity with the
reference CUDA kernels (src/rtpose/renderFunctions.cu), which
tests/test_ref_render_parity.py EXECUTES unmodified via the cuda_emu shim:

* render_pose (COCO, render_pose_coco_parts:394-636): per-person bbox cull
  + size-adaptive scale factor; ellipse limbs (alpha 0.5) then joint
  circles (alpha 0.6), radius = 2*h/200, stickwidth = h/120; googly eyes
  REPLACE the normal eye circles (:588-611).
* render_pose_mpi (render_pose_29parts:124-242): no bbox cull / scale
  factor, radius = 3*h/200, stickwidth = h/60, limb alpha 0.6, the l==0
  head limb drawn as an ellipse RING (a_sqrt*1.2, judge in [0.8, 1]),
  9-colour table cycled.
* render_heatmap: one channel bicubically sampled onto the canvas
  (x_on_box = (x+0.5)*w_net/w_canvas - 0.5), jet colormap.  COCO
  (render_pose_coco_heatmap:638-724) blends alpha 0.7 with getColor's
  B and R SWAPPED (b <- c[2], :715-717); MPI (:242-329) blends alpha 0.5
  unswapped.  Out-of-box pixels keep the default value, which is 1 only
  for part == num_parts-1 (the reference's quirk, :659/:259 — NOT the
  background channel).
* render_all_parts: nearest-sampled sum of value-weighted part colors,
  alpha 0.7, out-of-box pixels blend toward black
  (render_pose_coco_heatmap2:726-836; the __saturatef result is discarded
  there, so values are NOT clamped).
* render_paf: flow-colored (getColorXY) PAF overlay, bilinear when showing
  a single limb field, nearest when accumulating, alpha 0.7, blended with
  B and R swapped like the heatmap (render_pose_coco_affinity:838-975).

Canvas layout here is (H, W, 3) float32 BGR in 0..255 (the reference uses
planar BGR; interleaved is the TPU-friendly layout and converts at IO).
All functions are jit-compatible with static canvas/net shapes.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.imresize import _axis_matrix
from .descriptor import RENDER_MAX_PEOPLE

# (R, G, B) per part/limb color wheel (renderFunctions.cu:460-479)
COLORS = np.array([
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
    [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
    [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
    [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
    [255, 0, 170], [255, 0, 85],
], np.float32)

# limb tables (renderFunctions.cu:7-9)
LIMB_MPI = [0, 1, 2, 3, 3, 4, 5, 6, 6, 7, 8, 9, 9, 10, 11, 12, 12, 13]
LIMB_COCO_NOEAR = [1, 2, 1, 5, 2, 3, 3, 4, 5, 6, 6, 7, 1, 8, 8, 9, 9, 10,
                   1, 11, 11, 12, 12, 13, 1, 0, 0, 14, 14, 16, 0, 15, 15, 17]

# (R, G, B) 9-colour table of the MPI pose kernel (renderFunctions.cu:147-155)
MPI_COLORS = np.array([
    [255, 0, 0], [255, 170, 0], [170, 255, 0], [0, 255, 0],
    [0, 255, 170], [0, 170, 255], [0, 0, 255], [170, 0, 255],
    [255, 0, 170],
], np.float32)


def jet_color(v: jax.Array, vmin: float, vmax: float) -> jax.Array:
    """getColor (renderFunctions.cu:12-43): returns (..., 3) BGR floats."""
    v = jnp.clip(v, vmin, vmax)
    dv = vmax - vmin
    b = jnp.where(v < vmin + 0.125 * dv, 256 * (0.5 + v * 4),
        jnp.where(v < vmin + 0.375 * dv, 255.0,
        jnp.where(v < vmin + 0.625 * dv, 256 * (-4 * v + 2.5), 0.0)))
    g = jnp.where(v < vmin + 0.125 * dv, 0.0,
        jnp.where(v < vmin + 0.375 * dv, 256 * (v - 0.125) * 4,
        jnp.where(v < vmin + 0.625 * dv, 255.0,
        jnp.where(v < vmin + 0.875 * dv, 256 * (-4 * v + 3.5), 0.0))))
    r = jnp.where(v < vmin + 0.625 * dv,
        jnp.where(v < vmin + 0.375 * dv, 0.0, 256 * 4 * (v - 0.375)),
        jnp.where(v < vmin + 0.875 * dv, 255.0, 256 * (-4 * v + 4.5)))
    return jnp.stack([b, g, r], axis=-1)


def flow_color(vx: jax.Array, vy: jax.Array) -> jax.Array:
    """getColorXY (renderFunctions.cu:94-109): (..., 3) BGR floats."""
    rad = jnp.minimum(jnp.sqrt(vx * vx + vy * vy), 1.0)
    a = jnp.arctan2(-vy, -vx) / np.pi
    fk = jnp.nan_to_num((a + 1.0) / 2.0)
    v = 55.0 * jnp.clip(fk, 0.0, 1.0)
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    s = [RY, RY + YG, RY + YG + GC, RY + YG + GC + CB, RY + YG + GC + CB + BM,
         RY + YG + GC + CB + BM + MR]
    b = jnp.where(v < s[0], 255.0,
        jnp.where(v < s[1], 255 - 255 * (v - s[0]) / YG,
        jnp.where(v < s[3], 0.0,
        jnp.where(v < s[4], 255 * (v - s[3]) / BM, 255.0))))
    g = jnp.where(v < s[0], 255 * v / RY,
        jnp.where(v < s[2], 255.0,
        jnp.where(v < s[3], 255 - 255 * (v - s[2]) / CB, 0.0)))
    r = jnp.where(v < s[1], 0.0,
        jnp.where(v < s[2], 255 * (v - s[1]) / GC,
        jnp.where(v < s[4], 255.0,
        jnp.where(v < s[5], 255 - 255 * (v - s[4]) / MR, 255.0))))
    return jnp.stack([rad * b, rad * g, rad * r], axis=-1)


def render_pose(
    canvas: jax.Array,  # (H, W, 3) f32 BGR 0..255
    poses: jax.Array,  # (MAXP, num_parts, 3) display coords
    num_people: jax.Array,  # traced int
    num_parts: int = 18,
    threshold: float = 0.01,
    googly_eyes: bool = False,
) -> jax.Array:
    h, w, _ = canvas.shape
    maxp = poses.shape[0]
    limb = LIMB_COCO_NOEAR if num_parts == 18 else LIMB_MPI
    nlimb = len(limb) // 2
    limb_a = jnp.asarray(limb[0::2])
    limb_b = jnp.asarray(limb[1::2])
    colors = jnp.asarray(COLORS)
    radius = 2 * h / 200.0
    stickwidth = h / 120.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    # per-person bbox + scale factor (renderFunctions.cu:413-440)
    vis = poses[:, :, 2] > threshold
    big = jnp.float32(1e9)
    px = jnp.where(vis, poses[:, :, 0], big)
    py = jnp.where(vis, poses[:, :, 1], big)
    mins_x = jnp.minimum(jnp.min(px, 1), w)
    mins_y = jnp.minimum(jnp.min(py, 1), h)
    px = jnp.where(vis, poses[:, :, 0], -big)
    py = jnp.where(vis, poses[:, :, 1], -big)
    maxs_x = jnp.maximum(jnp.max(px, 1), 0)
    maxs_y = jnp.maximum(jnp.max(py, 1), 0)
    scalef = (maxs_x - mins_x + maxs_y - mins_y) / 2.0
    scalef = jnp.where(scalef < 200, jnp.maximum(scalef / 200, 0.33), 1.0)
    mins_x, mins_y = mins_x - 50, mins_y - 50
    maxs_x, maxs_y = maxs_x + 50, maxs_y + 50

    def person_body(p, canv):
        active = p < num_people
        inbox = (xx >= mins_x[p]) & (xx <= maxs_x[p]) & (yy >= mins_y[p]) & (yy <= maxs_y[p])
        pose_p = poses[p]
        sf = scalef[p]

        def limb_body(l, canv):
            a, b_ = limb_a[l], limb_b[l]
            xa, ya, va = pose_p[a, 0], pose_p[a, 1], pose_p[a, 2]
            xb, yb, vb = pose_p[b_, 0], pose_p[b_, 1], pose_p[b_, 2]
            draw = active & (va > threshold) & (vb > threshold)
            x_p = (xa + xb) / 2
            y_p = (ya + yb) / 2
            angle = jnp.arctan2(yb - ya, xb - xa)
            sine, cosine = jnp.sin(angle), jnp.cos(angle)
            a_sqrt = (xa - x_p) ** 2 + (ya - y_p) ** 2
            b_sqrt = sf * sf * stickwidth * stickwidth
            A = cosine * (xx - x_p) + sine * (yy - y_p)
            B = sine * (xx - x_p) - cosine * (yy - y_p)
            # raw IEEE division: coincident endpoints give a_sqrt == 0 ->
            # judge inf/nan -> comparisons false, exactly as the kernel
            judge = A * A / a_sqrt + B * B / b_sqrt
            inside = draw & inbox & (judge >= 0) & (judge <= 1)
            co = colors[l % len(COLORS)]
            alpha = 0.5
            rgb = jnp.stack([co[2], co[1], co[0]])  # canvas is BGR
            return jnp.where(inside[..., None], (1 - alpha) * canv + alpha * rgb, canv)

        canv = jax.lax.fori_loop(0, nlimb, limb_body, canv)

        def part_body(i, canv):
            lx, ly, val = pose_p[i, 0], pose_p[i, 1], pose_p[i, 2]
            draw = active & (val > threshold)
            dist2 = (xx - lx) ** 2 + (yy - ly) ** 2
            co = colors[i % len(COLORS)]
            if googly_eyes and num_parts == 18:
                is_eye = (i == 14) | (i == 15)
            else:
                is_eye = False
            maxr2 = sf * sf * radius * radius
            alpha = 0.6
            inside = draw & inbox & (dist2 <= maxr2)
            if not isinstance(is_eye, bool):
                # googly eyes REPLACE the normal circle for parts 14/15
                # (renderFunctions.cu:588 else-branch)
                inside = inside & ~is_eye
            rgb = jnp.stack([co[2], co[1], co[0]])
            canv = jnp.where(inside[..., None], (1 - alpha) * canv + alpha * rgb, canv)
            if isinstance(is_eye, bool):
                return canv
            # googly eyes (renderFunctions.cu:592-612)
            emaxr2 = sf * sf * (2.5 * radius) ** 2
            eminr2 = sf * sf * (2.5 * radius - 2) ** 2
            dist3 = (xx - 4 - lx) ** 2 + (yy - ly + 4) ** 2
            white = jnp.asarray([255.0, 255.0, 255.0])
            black = jnp.asarray([0.0, 0.0, 0.0])
            col = jnp.where((dist2 <= eminr2)[..., None], white, black)
            col = jnp.where(((dist2 <= eminr2 * 0.6) & (dist3 > 3.75 * 3.75))[..., None], black, col)
            einside = draw & inbox & is_eye & (dist2 <= emaxr2)
            return jnp.where(einside[..., None], 0.1 * canv + 0.9 * col, canv)

        return jax.lax.fori_loop(0, num_parts, part_body, canv)

    return jax.lax.fori_loop(0, maxp, person_body, canvas)


def render_pose_mpi(
    canvas: jax.Array,  # (H, W, 3) f32 BGR 0..255
    poses: jax.Array,  # (MAXP, 15, 3) display coords
    num_people: jax.Array,  # traced int
    threshold: float = 0.0,
) -> jax.Array:
    """MPI skeleton overlay (render_pose_29parts, renderFunctions.cu:124-242).

    Geometry differs from the COCO kernel: radius = 3*h/200, stickwidth =
    h/60, limb alpha 0.6, NO per-person bbox cull or size-adaptive scale,
    and the head limb (l == 0) is an ellipse RING: a_sqrt scaled by 1.2,
    b_sqrt = a_sqrt, judge accepted in [0.8, 1].  The host wrapper
    (render_mpi_parts:366) passes threshold 0.
    """
    h, w, _ = canvas.shape
    maxp = poses.shape[0]
    num_parts = 15
    nlimb = len(LIMB_MPI) // 2
    limb_a = jnp.asarray(LIMB_MPI[0::2])
    limb_b = jnp.asarray(LIMB_MPI[1::2])
    colors = jnp.asarray(MPI_COLORS)
    radius = 3 * h / 200.0
    stickwidth = h / 60.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def person_body(p, canv):
        active = p < num_people
        pose_p = poses[p]

        def limb_body(l, canv):
            a, b_ = limb_a[l], limb_b[l]
            xa, ya, va = pose_p[a, 0], pose_p[a, 1], pose_p[a, 2]
            xb, yb, vb = pose_p[b_, 0], pose_p[b_, 1], pose_p[b_, 2]
            draw = active & (va > threshold) & (vb > threshold)
            x_p = (xa + xb) / 2
            y_p = (ya + yb) / 2
            angle = jnp.arctan2(yb - ya, xb - xa)
            sine, cosine = jnp.sin(angle), jnp.cos(angle)
            a_sqrt = (xa - x_p) ** 2 + (ya - y_p) ** 2
            head = l == 0
            a_sqrt = jnp.where(head, a_sqrt * 1.2, a_sqrt)
            b_sqrt = jnp.where(head, a_sqrt,
                               jnp.float32(stickwidth * stickwidth))
            min_v = jnp.where(head, 0.8, 0.0)
            A = cosine * (xx - x_p) + sine * (yy - y_p)
            B = sine * (xx - x_p) - cosine * (yy - y_p)
            judge = A * A / a_sqrt + B * B / b_sqrt
            inside = draw & (judge >= min_v) & (judge <= 1)
            co = colors[l % len(MPI_COLORS)]
            alpha = 0.6
            bgr = jnp.stack([co[2], co[1], co[0]])
            return jnp.where(inside[..., None],
                             (1 - alpha) * canv + alpha * bgr, canv)

        canv = jax.lax.fori_loop(0, nlimb, limb_body, canv)

        def part_body(i, canv):
            lx, ly, val = pose_p[i, 0], pose_p[i, 1], pose_p[i, 2]
            draw = active & (val > threshold)
            dist2 = (xx - lx) ** 2 + (yy - ly) ** 2
            co = colors[i % len(MPI_COLORS)]
            inside = draw & (dist2 <= radius * radius)
            bgr = jnp.stack([co[2], co[1], co[0]])
            return jnp.where(inside[..., None], 0.6 * canv + 0.4 * bgr, canv)

        return jax.lax.fori_loop(0, num_parts, part_body, canv)

    return jax.lax.fori_loop(0, maxp, person_body, canvas)


@lru_cache(maxsize=32)
def _box_matrices(h_net: int, w_net: int, h_canvas: int, w_canvas: int):
    """Canvas->net bicubic matrices; the kernels' x_on_box mapping equals the
    ImResize axis convention with pad 0."""
    return _axis_matrix(h_net, 0, h_canvas), _axis_matrix(w_net, 0, w_canvas)


def _box_valid(h_net, w_net, h_canvas, w_canvas):
    ys = (np.arange(h_canvas) + 0.5) * (h_net / h_canvas) - 0.5
    xs = (np.arange(w_canvas) + 0.5) * (w_net / w_canvas) - 0.5
    vy = (ys >= 0) & (ys < h_net)
    vx = (xs >= 0) & (xs < w_net)
    return np.outer(vy, vx)


def _nearest_idx(size_net, size_canvas):
    t = (np.arange(size_canvas) + 0.5) * (size_net / size_canvas) - 0.5
    n1 = np.trunc(t + 1e-5).astype(np.int64)
    return np.clip(n1, 0, size_net - 1)


def render_heatmap(
    canvas: jax.Array, net_maps: jax.Array, part: int, num_parts: int = 18
) -> jax.Array:
    """Overlay one net-res channel (part index into the resized maps)."""
    h, w, _ = canvas.shape
    c, h_net, w_net = net_maps.shape
    Ay, Ax = _box_matrices(h_net, w_net, h, w)
    plane = net_maps[part].astype(jnp.float32)
    up = jnp.asarray(Ay) @ plane @ jnp.asarray(Ax).T  # (h, w)
    # reference quirk: the out-of-box default is 1 only for the LAST part
    # channel, not the background (renderFunctions.cu:659 / :259)
    default = 1.0 if part == num_parts - 1 else 0.0
    valid = jnp.asarray(_box_valid(h_net, w_net, h, w))
    up = jnp.where(valid, up, default)
    vmin, vmax = (0.0, 1.0) if part < num_parts + 1 else (-1.0, 1.0)
    col = jet_color(up, vmin, vmax)
    if num_parts == 18:
        # COCO blends alpha 0.7 with getColor's B/R channels swapped
        # (b <- c[2], renderFunctions.cu:715-717)
        return 0.3 * canvas + 0.7 * col[..., ::-1]
    # MPI blends alpha 0.5 unswapped (renderFunctions.cu:320-322)
    return 0.5 * canvas + 0.5 * col


def render_all_parts(canvas: jax.Array, net_maps: jax.Array, num_parts: int = 18) -> jax.Array:
    """Sum of value-weighted part colors, nearest-sampled (heatmap2)."""
    h, w, _ = canvas.shape
    c, h_net, w_net = net_maps.shape
    iy = jnp.asarray(_nearest_idx(h_net, h))
    ix = jnp.asarray(_nearest_idx(w_net, w))
    sampled = net_maps[:num_parts][:, iy][:, :, ix].astype(jnp.float32)  # (P, h, w)
    colors = jnp.asarray(COLORS)[:num_parts]  # (P, 3) RGB
    acc_rgb = jnp.einsum("phw,pc->hwc", sampled, colors)
    acc_bgr = acc_rgb[..., ::-1]
    # out-of-box pixels accumulate nothing and blend toward black
    # (the kernel's bounds check, renderFunctions.cu:786)
    valid = jnp.asarray(_box_valid(h_net, w_net, h, w))
    acc_bgr = jnp.where(valid[..., None], acc_bgr, 0.0)
    return 0.3 * canvas + 0.7 * acc_bgr


def render_paf(
    canvas: jax.Array, net_maps: jax.Array, in_part: int, num_parts_accum: int = 1
) -> jax.Array:
    """Flow-colored PAF overlay; bilinear for a single field, nearest for the
    accumulated view (render_pose_coco_affinity)."""
    h, w, _ = canvas.shape
    c, h_net, w_net = net_maps.shape
    maps = net_maps.astype(jnp.float32)
    valid = jnp.asarray(_box_valid(h_net, w_net, h, w))
    if num_parts_accum == 1:
        ys = (jnp.arange(h) + 0.5) * (h_net / h) - 0.5
        xs = (jnp.arange(w) + 0.5) * (w_net / w) - 0.5
        y1 = jnp.clip(jnp.trunc(ys + 1e-5).astype(jnp.int32), 0, h_net - 1)
        x1 = jnp.clip(jnp.trunc(xs + 1e-5).astype(jnp.int32), 0, w_net - 1)
        y2 = jnp.minimum(y1 + 1, h_net - 1)
        x2 = jnp.minimum(x1 + 1, w_net - 1)
        dy = (ys - y1)[:, None]
        dx = (xs - x1)[None, :]

        def bilinear(plane):
            a = plane[y1][:, x1]
            b_ = plane[y1][:, x2]
            cc = plane[y2][:, x1]
            d = plane[y2][:, x2]
            return (1 - dx) * (1 - dy) * a + dx * (1 - dy) * b_ + (1 - dx) * dy * cc + dx * dy * d

        vx = bilinear(maps[in_part])
        vy = bilinear(maps[in_part + 1])
        col = flow_color(vx, vy)
        col = jnp.where(valid[..., None], col, 0.0)
    else:
        iy = jnp.asarray(_nearest_idx(h_net, h))
        ix = jnp.asarray(_nearest_idx(w_net, w))
        acc = jnp.zeros((h, w, 3), jnp.float32)
        for k in range(num_parts_accum):
            p = in_part + 2 * k
            vx = maps[p][iy][:, ix]
            vy = maps[p + 1][iy][:, ix]
            acc = acc + jnp.where(valid[..., None], flow_color(vx, vy), 0.0)
        col = jnp.minimum(acc, 255.0)
    # the kernel blends getColorXY's output with B/R swapped
    # (b <- c[2], renderFunctions.cu:965-967), like the COCO heatmap
    return 0.3 * canvas + 0.7 * col[..., ::-1]
