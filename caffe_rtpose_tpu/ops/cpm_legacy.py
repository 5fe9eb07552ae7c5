"""Legacy single-person CPM helpers.

TPU re-expression of the crop-around-peak kernels behind the original
(pre-PAF) single-person CPM head (reference src/caffe/cpm/util/
math_functions.cu: ``fill_image``/``fill_gassian``/``fill_pose_net`` — the
last is dead code there, guarded by ``CHECK(0)``).  They pair with the
``Maximum`` layer (per-channel argmax head): crop a boxsize patch around each
detected person center and append a centered gaussian as the 4th channel.

Here the per-person scalar loops become one gathered slice per person under
``vmap`` — all people are cropped in a single fused program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fill_gaussian(boxsize: int, sigma: float = 21.0) -> jax.Array:
    """(boxsize, boxsize) centered gaussian with the reference's exp cutoff
    (fill_gassian, math_functions.cu:37-52)."""
    c = boxsize / 2
    xs = jnp.arange(boxsize, dtype=jnp.float32)
    d2 = (xs[None, :] - c) ** 2 + (xs[:, None] - c) ** 2
    expo = d2 / (2.0 * sigma * sigma)
    return jnp.where(expo > 4.6052, 0.0, jnp.exp(-expo))


def fill_image(image_chw: jax.Array, center_xy: jax.Array, boxsize: int) -> jax.Array:
    """Crop a (3, boxsize, boxsize) patch centered on ``center_xy`` (x, y),
    zero-padded outside the image (fill_image, math_functions.cu:7-35;
    center rounded with +0.5 like the kernel)."""
    image_chw = jnp.asarray(image_chw)
    _, h, w = image_chw.shape
    cx = jnp.floor(center_xy[0] + 0.5).astype(jnp.int32)
    cy = jnp.floor(center_xy[1] + 0.5).astype(jnp.int32)
    x0 = cx - boxsize // 2
    y0 = cy - boxsize // 2
    xs = x0 + jnp.arange(boxsize)
    ys = y0 + jnp.arange(boxsize)
    in_x = (xs >= 0) & (xs < w)
    in_y = (ys >= 0) & (ys < h)
    xc = jnp.clip(xs, 0, w - 1)
    yc = jnp.clip(ys, 0, h - 1)
    patch = image_chw[:, yc][:, :, xc]
    mask = (in_y[:, None] & in_x[None, :]).astype(patch.dtype)
    return patch * mask[None]


def fill_pose_net(image_chw: jax.Array, centers_xy: jax.Array, boxsize: int,
                  sigma: float = 21.0) -> jax.Array:
    """All-person batch: (P, 2) centers -> (P, 4, boxsize, boxsize) patches
    with the centered gaussian as channel 3 (fill_pose_net semantics,
    math_functions.cu:55-95, without the reference's dead-code CHECK)."""
    g = fill_gaussian(boxsize, sigma)

    def one(center):
        patch = fill_image(image_chw, center, boxsize)
        return jnp.concatenate([patch, g[None].astype(patch.dtype)], axis=0)

    return jax.vmap(one)(centers_xy.astype(jnp.float32))
