"""Heatmap peak extraction (the reference's Nms layer, GPU path).

Semantics reproduced from reference src/caffe/cpm/layers/nms_layer.cu:

1. a pixel is a peak iff it is interior (not on any border), its value is
   > threshold, and it is strictly greater than all 8 neighbors
   (nms_register_kernel, nms_layer.cu:15-46);
2. peaks are emitted in raster-scan order (exclusive-scan compaction,
   nms_layer.cu:173-176), at most ``max_peaks`` per part channel;
3. each peak gets sub-pixel refinement: a score-weighted centroid over the
   7x7 window, counting only samples with score > 0 and with the reference's
   boundary conditions — note the reference checks both x and y offsets
   against *width* and excludes row/column 0 (``(p+d) > 0 && (p+d) < width``,
   nms_layer.cu:78-94).  We replicate that quirk but additionally clamp reads
   to the channel's own rows (the reference can read past the channel for
   peaks within 3 px of the bottom edge — an out-of-bounds bug we do not
   reproduce);
4. output is [num_parts, max_peaks+1, 3]; slot 0 holds the peak count (we cap
   it at max_peaks — the reference stores the uncapped count but then indexes
   out of range when consuming it, rtpose.cpp:841-843).

TPU-native design: peak *detection* is a fused elementwise stencil (VPU);
raster-order compaction uses ``top_k`` over a descending-position key instead
of a scan+scatter (scatters are slow on TPU); refinement is a batched
49-tap gather around at most ``max_peaks`` candidates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_peaks_mask(heat: jax.Array, threshold) -> jax.Array:
    """heat: (C, H, W) -> bool mask of strict-8-neighbor local maxima."""
    c, h, w = heat.shape
    neg = jnp.float32(-np.inf)
    p = jnp.pad(heat.astype(jnp.float32), ((0, 0), (1, 1), (1, 1)), constant_values=neg)
    ctr = p[:, 1:-1, 1:-1]
    mask = ctr > threshold
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mask &= ctr > p[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
    # borders are never peaks (nms_register_kernel writes 0 on borders)
    border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    return mask & border


def nms_peaks(
    heat: jax.Array,
    threshold,
    max_peaks: int,
) -> jax.Array:
    """heat: (C, H, W) part confidence maps -> (C, max_peaks+1, 3) peaks.

    ``threshold`` may be a traced scalar (the demo retunes it per frame via
    NmsLayer::SetThreshold, rtpose.cpp:1145).
    """
    c, h, w = heat.shape
    heatf = heat.astype(jnp.float32)
    mask = find_peaks_mask(heatf, threshold)  # (C, H, W)

    # Raster-order compaction via top_k over key = (hw - pos) for masked
    # pixels.  TPU top_k is a full sort, so first reduce 4x: two strict local
    # maxima can never share a 2x2 block (they would be 8-neighbors), hence a
    # 2x2 block-max of the keys preserves every peak.
    pos2d = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    key = jnp.where(mask, h * w - pos2d, 0)  # (C, H, W)
    # odd trailing row/col are borders (never peaks), safe to drop
    h2, w2 = h - (h % 2), w - (w % 2)
    kb = key[:, :h2, :w2].reshape(c, h2 // 2, 2, w2 // 2, 2).max(axis=(2, 4))
    return peaks_from_keys(heatf, kb, max_peaks)


def peaks_from_keys(heatf: jax.Array, kb: jax.Array, max_peaks: int) -> jax.Array:
    """Compaction + refinement half of the NMS: ``kb`` is the 2x2 block-max
    of the raster keys (from :func:`nms_peaks` or the fused Pallas kernel
    ops/nms_pallas.upsample_peak_keys)."""
    c, h, w = heatf.shape
    hw = h * w
    kb = kb.reshape(c, -1)
    counts = jnp.sum(kb > 0, axis=1).astype(jnp.int32)  # uncapped; one
    # nonzero block per peak (two strict maxima never share a 2x2 block)
    topk = min(max_peaks, hw)
    kvals, _ = jax.lax.top_k(kb, topk)  # descending key = ascending pos
    valid = kvals > 0  # rank < count
    peak_pos = jnp.where(valid, hw - kvals, 0)
    px = (peak_pos % w).astype(jnp.float32)
    py = (peak_pos // w).astype(jnp.float32)

    # 7x7 score-weighted centroid refinement
    offs = np.stack(np.meshgrid(np.arange(-3, 4), np.arange(-3, 4), indexing="ij"), -1).reshape(-1, 2)
    dys = jnp.asarray(offs[:, 0], jnp.int32)  # (49,)
    dxs = jnp.asarray(offs[:, 1], jnp.int32)
    yy = peak_pos[..., None] // w + dys  # (C, topk, 49)
    xx = peak_pos[..., None] % w + dxs
    # reference bounds quirk: both axes checked against width, strict > 0;
    # we additionally require yy < h so reads stay inside the channel.
    in_bounds = (yy > 0) & (yy < w) & (yy < h) & (xx > 0) & (xx < w)
    yyc = jnp.clip(yy, 0, h - 1)
    xxc = jnp.clip(xx, 0, w - 1)
    flat_idx = yyc * w + xxc  # (C, topk, 49)
    scores = jnp.take_along_axis(heatf.reshape(c, hw), flat_idx.reshape(c, -1), axis=1).reshape(c, topk, 49)
    use = in_bounds & (scores > 0)
    scores = jnp.where(use, scores, 0.0)
    wsum = jnp.sum(scores, axis=-1)
    x_acc = jnp.sum(scores * xx.astype(jnp.float32), axis=-1)
    y_acc = jnp.sum(scores * yy.astype(jnp.float32), axis=-1)
    safe = jnp.where(wsum > 0, wsum, 1.0)
    x_ref = x_acc / safe
    y_ref = y_acc / safe
    center = jnp.take_along_axis(heatf.reshape(c, hw), peak_pos, axis=1)

    rows = jnp.stack(
        [
            jnp.where(valid, x_ref, 0.0),
            jnp.where(valid, y_ref, 0.0),
            jnp.where(valid, center, 0.0),
        ],
        axis=-1,
    )  # (C, topk, 3)
    if topk < max_peaks:
        rows = jnp.pad(rows, ((0, 0), (0, max_peaks - topk), (0, 0)))

    head = jnp.zeros((c, 1, 3), jnp.float32).at[:, 0, 0].set(
        jnp.minimum(counts, max_peaks).astype(jnp.float32)
    )
    return jnp.concatenate([head, rows], axis=1)  # (C, max_peaks+1, 3)
