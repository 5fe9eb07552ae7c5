"""Device-side CPM label rasterization.

TPU-first re-design of the reference's label-generation hot loop
(DataTransformer::generateLabelMap, data_transformer.cpp:2117-2264 with
putGaussianMaps :2002 and putVecMaps :2063): instead of rasterizing
2*(np+1) = 114 channels of 46x46 grids per sample in scalar host loops and
shipping ~1 MB/sample of labels to the device, the host ships only the
augmented joint coordinates (~1 KB/sample) and the full label tensor is
rasterized *inside the compiled train step* — a few fused elementwise ops on
the VPU, overlapped with the forward pass by XLA's scheduler.

Semantics are bit-matched to ``training.transformer.generate_label_map``
(the host reference implementation, itself matched to the C++):

* part gaussians accumulate over people then clamp at 1.0, with the
  reference's exp cutoff at 4.6052;
* PAF corridors resolve overlapping people by LAST WRITER in person order
  (the reference's count matrix never increments on first write — reproduced
  via a sequential ``lax.scan`` over the fixed person axis);
* weight channels gate on the main person's visibility != 3;
* the background channel is 1 - max(part gaussians), clamped at 0.

Layout: output is physical NHWC (B, grid_y, grid_x, 2*(np+1)) ready to feed
the jitted loss directly.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import MID_1, MID_2, AugParams


def make_label_fn(prm: AugParams, max_people: int = 12):
    """Returns a jittable ``fn(joints, vis, weight) -> label_nhwc``:

    * joints: (B, max_people, 18, 2) f32, augmented input-pixel coords
      (person 0 = the main person);
    * vis:    (B, max_people, 18) i32 reference visibility codes
      (<=1 usable, 2 outside, 3 absent; pad people with 3);
    * weight: (B, grid_y, grid_x) f32 mask_miss grid in [0, 1];
    * label:  (B, grid_y, grid_x, 2*(np+1)) f32.
    """
    np_ = prm.np
    stride = prm.stride
    sigma = float(prm.sigma)
    gx_n = prm.crop_size_x // stride
    gy_n = prm.crop_size_y // stride
    mid1 = jnp.asarray(np.asarray(MID_1, np.int32) - 1)
    mid2 = jnp.asarray(np.asarray(MID_2, np.int32) - 1)
    n_limbs = len(MID_1)
    thre = 1.0

    xs = jnp.arange(gx_n, dtype=jnp.float32)
    ys = jnp.arange(gy_n, dtype=jnp.float32)
    # gaussian sample positions in input pixel space (putGaussianMaps :2007)
    gxs = stride / 2.0 - 0.5 + xs * stride
    gys = stride / 2.0 - 0.5 + ys * stride

    def gaussians(joints_p, usable_p):
        """(P, 18, 2), (P, 18) -> (gy, gx, 18) accumulated+clamped."""
        d2 = (
            (gxs[None, None, :, None] - joints_p[:, None, None, :, 0]) ** 2
            + (gys[None, :, None, None] - joints_p[:, None, None, :, 1]) ** 2
        )  # (P, gy, gx, 18)
        expo = d2 / (2.0 * sigma * sigma)
        contrib = jnp.where(expo > 4.6052, 0.0, jnp.exp(-expo))
        contrib = contrib * usable_p[:, None, None, :]
        return jnp.minimum(contrib.sum(0), 1.0)

    def pafs(joints_p, usable_p):
        """(P, 18, 2), (P, 18) -> (gy, gx, 2*n_limbs) last-writer corridors."""
        a = joints_p[:, mid1, :] * (1.0 / 8.0)  # (P, L, 2) grid coords
        b = joints_p[:, mid2, :] * (1.0 / 8.0)
        bc = b - a
        norm = jnp.sqrt((bc ** 2).sum(-1))
        u = bc / jnp.maximum(norm, 1e-12)[..., None]
        valid = (
            (usable_p[:, mid1] > 0) & (usable_p[:, mid2] > 0) & (norm > 0)
        )  # (P, L)
        # integer bbox (putVecMaps :2072-2075); std::round = half away
        # from zero: sign(v)*floor(|v|+0.5)
        def _cround(v):
            return jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)

        min_x = jnp.maximum(_cround(jnp.minimum(a[..., 0], b[..., 0]) - thre), 0)
        max_x = jnp.minimum(_cround(jnp.maximum(a[..., 0], b[..., 0]) + thre), gx_n)
        min_y = jnp.maximum(_cround(jnp.minimum(a[..., 1], b[..., 1]) - thre), 0)
        max_y = jnp.minimum(_cround(jnp.maximum(a[..., 1], b[..., 1]) + thre), gy_n)

        def person_step(carry, inp):
            vx, vy = carry
            a_p, u_p, v_p, mnx, mxx, mny, mxy = inp  # per-person slices
            in_x = (xs[None, None, :] >= mnx[:, None, None]) & (xs[None, None, :] < mxx[:, None, None])
            in_y = (ys[None, :, None] >= mny[:, None, None]) & (ys[None, :, None] < mxy[:, None, None])
            dist = jnp.abs(
                (xs[None, None, :] - a_p[:, 0, None, None]) * u_p[:, 1, None, None]
                - (ys[None, :, None] - a_p[:, 1, None, None]) * u_p[:, 0, None, None]
            )  # (L, gy, gx)
            sel = in_x & in_y & (dist <= thre) & v_p[:, None, None]
            vx = jnp.where(sel, u_p[:, 0, None, None], vx)
            vy = jnp.where(sel, u_p[:, 1, None, None], vy)
            return (vx, vy), None

        z = jnp.zeros((n_limbs, gy_n, gx_n), jnp.float32)
        (vx, vy), _ = jax.lax.scan(
            person_step, (z, z),
            (a, u, valid, min_x, max_x, min_y, max_y),
        )
        # interleave x/y per limb -> (gy, gx, 2L)
        paf = jnp.stack([vx, vy], axis=1).reshape(2 * n_limbs, gy_n, gx_n)
        return jnp.transpose(paf, (1, 2, 0))

    def one_sample(joints_p, vis_p, weight):
        usable = (vis_p <= 1).astype(jnp.float32)
        g = gaussians(joints_p, usable)  # (gy, gx, 18)
        paf = pafs(joints_p, usable)  # (gy, gx, 38)
        main_on = (vis_p[0, :] != 3).astype(jnp.float32)  # (18,)
        # weight channels 0..np_-1: only the first 18 carry data; the rest
        # (and channel np_) use the plain weight (generate_label_map :316-322)
        w18 = weight[..., None] * main_on[None, None, :]
        w_rest = jnp.broadcast_to(weight[..., None], (gy_n, gx_n, np_ - 18 + 1))
        bkg = jnp.maximum(1.0 - g.max(axis=-1, keepdims=True), 0.0)
        # channel layout (generate_label_map): [0..17] gated weights,
        # [18..np_] plain weights, [np_+1..np_+38] PAFs, [np_+39..np_+56]
        # gaussians, [2np_+1] background
        return jnp.concatenate([w18, w_rest, paf, g, bkg], axis=-1)

    def label_fn(joints, vis, weight):
        return jax.vmap(one_sample)(
            jnp.asarray(joints, jnp.float32),
            jnp.asarray(vis, jnp.int32),
            jnp.asarray(weight, jnp.float32),
        )

    return label_fn


def make_input_transform(prm: AugParams, max_people: int = 12,
                         data_u8: bool = False):
    """Solver ``input_transform``: {data, joints, vis, weight} ->
    {data, label} with the label rasterized on device.

    ``data_u8``: the host ships raw augmented u8 images (4x less H2D than
    f32) and the exact ``(x - 128)/256`` normalize (Transform_nv
    :1358-1361) runs on device."""
    label_fn = make_label_fn(prm, max_people)

    def tf(inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        out = {k: v for k, v in inputs.items() if k not in ("joints", "vis", "weight")}
        if data_u8:
            out["data"] = (out["data"].astype(jnp.float32) - 128.0) / 256.0
        out["label"] = label_fn(inputs["joints"], inputs["vis"], inputs["weight"])
        return out

    return tf


def pose_batches_jointfeed(
    source,
    prm: AugParams,
    batch_size: int,
    max_people: int = 12,
    seed: int = 0,
    train: bool = True,
    data_u8: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Endless {data, joints, vis, weight} batches: host does the image
    augmentation chain (cv2 warps), the device rasterizes labels.  Pair with
    :func:`make_input_transform` on the Solver (matching ``data_u8``)."""
    from .datasets import _clone_meta  # lazy: avoids cycle at import
    from .transformer import transform_meta

    rs = np.random.RandomState(seed)
    n = len(source)
    gy, gx = prm.crop_size_y // prm.stride, prm.crop_size_x // prm.stride
    while True:
        datas = np.zeros((batch_size, 3, prm.crop_size_y, prm.crop_size_x),
                         np.uint8 if data_u8 else np.float32)
        joints = np.zeros((batch_size, max_people, 18, 2), np.float32)
        vis = np.full((batch_size, max_people, 18), 3, np.int32)
        weight = np.ones((batch_size, gy, gx), np.float32)
        for bi in range(batch_size):
            img, meta, mask = source[int(rs.randint(n))]
            m = _clone_meta(meta)
            d, people, mask_grid = transform_meta(img, m, prm, rng=rs,
                                                  mask_miss=mask, train=train,
                                                  normalize=not data_u8)
            datas[bi] = d
            for pi, p in enumerate(people[:max_people]):
                joints[bi, pi] = p.joints[:18]
                vis[bi, pi] = p.visible[:18]
            if mask_grid is not None:
                weight[bi] = mask_grid.astype(np.float32)[:gy, :gx] / 255.0
        yield {"data": datas, "joints": joints, "vis": vis, "weight": weight}
