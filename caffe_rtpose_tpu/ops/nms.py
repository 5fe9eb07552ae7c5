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
   nms_layer.cu:78-94).  For wide maps (W > H) a peak within 3 px of the
   bottom edge therefore reads past the channel — but the blob is
   contiguous NCHW, so on hardware the read deterministically lands in
   channel c+1 at row y-H (the background heatmap for the last part).  When
   the caller provides the channels beyond ``num_parts`` we replicate that
   flat-buffer semantics exactly (pinned by test_ref_gpu_kernel_parity
   against the executed reference kernel); with exactly ``num_parts``
   channels the out-of-buffer taps are masked out instead (documented
   divergence, pallas opt-in path only);
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
    """heat: (C, H, W) -> bool mask of strict-8-neighbor local maxima.

    Borders are never peaks (nms_register_kernel writes 0 on borders), so
    the stencil only needs the interior, and ``x > all 8 neighbors`` is
    ``x > max(8 neighbors)``, built SEPARABLY: a horizontal 3-max, its
    vertical pairs (rows y-1, y+1 cover 6 taps), plus the same-row x+-1
    pair.  The naive form (8 shifted compare-AND passes over an -inf-padded
    f32 copy) left 8 unfused full-map traversals (~0.40 ms/frame at
    18x368x656 batch 8); this is 2 staged max maps + one fused compare
    (~0.13 ms).  Strict-> semantics are identical (max distributes over >)."""
    c, h, w = heat.shape
    hf = heat.astype(jnp.float32)
    ctr = hf[:, 1:-1, 1:-1]
    row3 = jnp.maximum(jnp.maximum(hf[:, :, :-2], hf[:, :, 1:-1]), hf[:, :, 2:])
    vert = jnp.maximum(row3[:, :-2, :], row3[:, 2:, :])  # rows y-1, y+1
    horz = jnp.maximum(hf[:, 1:-1, :-2], hf[:, 1:-1, 2:])  # x-1, x+1
    n8 = jnp.maximum(vert, horz)
    mask = (ctr > threshold) & (ctr > n8)
    return jnp.pad(mask, ((0, 0), (1, 1), (1, 1)))


def block_keys(mask: jax.Array, h: int, w: int) -> jax.Array:
    """(C, H, W) bool peak mask -> (C, nb) s32 keys in RASTER-POSITION order.

    Each horizontal pixel pair (y, 2bx)/(y, 2bx+1) collapses to one key
    (= ``hw - pos`` of its peak, 0 if none): adjacent pixels are 8-neighbors,
    so two strict maxima can never share a pair — lossless 2x reduction.
    Crucially, the flattened (y, bx) order equals ascending-position order
    (the two pixels of a pair are consecutive in raster position), which is
    what :func:`compact_keys` requires.  A 2x2 block reduction would NOT
    preserve it: a block can hold an odd-sub-row peak whose position follows
    an even-sub-row peak of a *later* block.  Built with a strided select
    over the bool mask — never materializes a full-res s32 key map.
    """
    c = mask.shape[0]
    # odd trailing col is border (never peaks), safe to drop
    w2 = w - (w % 2)
    mb = mask[:, :, :w2].reshape(c, h, w2 // 2, 2)
    m0, m1 = mb[:, :, :, 0], mb[:, :, :, 1]
    base = (
        jnp.arange(h, dtype=jnp.int32)[:, None] * w
        + jnp.arange(w2 // 2, dtype=jnp.int32)[None, :] * 2
    )
    # at most one of the pair is set; pick the min raster pos
    pos = jnp.where(m0, base, base + 1)
    return jnp.where(m0 | m1, h * w - pos, 0).reshape(c, -1)


_BS = 512  # compaction block size (lane-aligned; ~2M ops at 656x368)


def compact_keys(kb: jax.Array, hw: int, max_peaks: int):
    """Raster-order compaction of position-ordered keys WITHOUT a sort.

    kb: (C, nb) keys (= hw - pos, 0 where empty) whose flattened order
    must equal ascending-position order (see :func:`block_keys`).  The r-th
    peak then lives at the r-th masked slot: rank with an inclusive cumsum,
    then find each rank's slot with a searchsorted-style compare-and-count
    that XLA fuses into one reduction (top_k is a full bitonic sort — it was
    the single most expensive op in the fused program).

    Two-level ranking (both levels are the same compare-and-count idea):
    slots are tiled into blocks of ``_BS``; block peak-counts locate the r-th
    peak's block, and the within-block search runs over ``topk * _BS`` slots
    instead of all of ``nb``.  The flat version's (C, nb, topk)
    compare-reduce was 139M ops at 656x368 (~0.29 ms/frame).

    GATHER-FREE: the obvious ``take_along_axis`` row pulls scalarize on TPU
    (measured ~0.27 ms/frame for 18x64 row gathers at 656x368); every
    selection here is a one-hot matmul instead — block pull and final
    element pick are 0/1-weighted dots, the within-block cumsum is a
    lower-triangular matmul — ~2 MFLOP total on the MXU (measured ~0.09 ms,
    scripts/repro_post2.py).  Everything stays EXACT: one-hot products add
    at most one nonzero term, counts are <= _BS, and the value-carrying
    dots run at HIGHEST precision so integers up to 2^24 survive the MXU's
    bf16 passes (hw = 241k at 656x368).

    Returns (peak_pos (C, topk) s32, valid (C, topk) bool, counts (C,) s32).
    """
    c, nb = kb.shape
    kf = kb.astype(jnp.float32)
    mask = kf > 0
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)  # uncapped
    topk = min(max_peaks, hw)
    ranks = jnp.arange(1, topk + 1, dtype=jnp.int32)

    nbk = -(-nb // _BS)
    pad = nbk * _BS - nb
    kbp = jnp.pad(kf, ((0, 0), (0, pad))).reshape(c, nbk, _BS)
    bc = jnp.sum(kbp > 0, axis=2, dtype=jnp.float32)  # (C, nbk) peaks/block
    incl = jnp.cumsum(bc, axis=1)
    excl = incl - bc
    # block of the r-th peak = #blocks whose inclusive count is still < r
    blk = jnp.sum(
        incl[:, :, None] < ranks[None, None, :], axis=1, dtype=jnp.int32
    )  # (C, topk)
    blk = jnp.minimum(blk, nbk - 1)
    onehot = (
        blk[:, :, None] == jnp.arange(nbk, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)  # (C, topk, nbk)
    rows = jnp.einsum(
        "ctn,cns->cts", onehot, kbp, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (C, topk, _BS)
    r_in = ranks[None, :].astype(jnp.float32) - jnp.einsum(
        "ctn,cn->ct", onehot, excl, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # 1-based rank within the block
    tri = jnp.tril(jnp.ones((_BS, _BS), jnp.float32))
    rcsum = jnp.einsum(  # inclusive cumsum as a 0/1 triangular matmul
        "cts,us->ctu", (rows > 0).astype(jnp.float32), tri,
        preferred_element_type=jnp.float32,
    )
    iin = jnp.sum(rcsum < r_in[:, :, None], axis=2, dtype=jnp.int32)
    iin = jnp.minimum(iin, _BS - 1)
    sel = (
        iin[:, :, None] == jnp.arange(_BS, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)
    kvals = jnp.sum(rows * sel, axis=2)
    valid = counts[:, None] >= ranks[None, :]
    peak_pos = jnp.where(valid, hw - kvals.astype(jnp.int32), 0)
    return peak_pos, valid, counts


def nms_peaks(
    heat: jax.Array,
    threshold,
    max_peaks: int,
    num_parts: int | None = None,
) -> jax.Array:
    """heat: (C, H, W) confidence maps -> (num_parts, max_peaks+1, 3) peaks.

    ``num_parts`` (default C) selects the channels NMS runs on
    (NmsLayer uses only the first num_parts_ of its 57-channel bottom,
    nms_layer.cu:144); passing the FULL map lets refinement replicate the
    reference's past-the-channel window reads (see module docstring).
    ``threshold`` may be a traced scalar (the demo retunes it per frame via
    NmsLayer::SetThreshold, rtpose.cpp:1145).
    """
    c, h, w = heat.shape
    p = c if num_parts is None else int(num_parts)
    heatf = heat.astype(jnp.float32)
    mask = find_peaks_mask(heatf[:p], threshold)  # (P, H, W)
    kb = block_keys(mask, h, w)
    return peaks_from_keys(heatf, kb, max_peaks, ordered=True)


def peaks_from_keys(
    heatf: jax.Array, kb: jax.Array, max_peaks: int, ordered: bool = False
) -> jax.Array:
    """Compaction + refinement half of the NMS.

    ``heatf`` is (C_all, H, W) with C_all >= P = kb.shape[0]: the first P
    channels are the peak channels; any extra channels let the refinement
    replicate the reference's flat-buffer window reads past a channel's
    bottom edge (nms_layer.cu:82 indexes ``src[(y+dy)*W + x+dx]`` with y+dy
    bounded by *width*, so wide-map reads land in channel c+1).  Taps past
    the END of the provided buffer are masked out.

    ``ordered=True``: kb comes from :func:`block_keys` (flattened order ==
    position order) and compaction is the sort-free :func:`compact_keys`.
    ``ordered=False``: kb is an arbitrary-arrangement key map (e.g. the 2x2
    block-max from the fused Pallas kernel ops/nms_pallas.upsample_peak_keys,
    whose block order does NOT match position order) — fall back to top_k,
    which sorts by key value.
    """
    c_all, h, w = heatf.shape
    hw = h * w
    kb = kb.reshape(kb.shape[0], -1)
    p = kb.shape[0]
    if ordered:
        peak_pos, valid, counts = compact_keys(kb, hw, max_peaks)
    else:
        counts = jnp.sum(kb > 0, axis=1).astype(jnp.int32)
        topk = min(max_peaks, hw)
        kvals, _ = jax.lax.top_k(kb, topk)  # descending key = ascending pos
        valid = kvals > 0
        peak_pos = jnp.where(valid, hw - kvals, 0)
    topk = peak_pos.shape[1]

    # 7x7 window values: one flat gather over the whole (C_all*H*W) buffer,
    # reproducing the reference's channel-continuation reads
    yy, xx, in_bounds = _window_coords(peak_pos, h, w)
    chan = jnp.arange(p, dtype=jnp.int32)[:, None, None]
    flat_idx = chan * hw + yy * w + xx  # (P, topk, 49); yy may exceed h-1
    in_buffer = flat_idx < c_all * hw
    flat = heatf.reshape(-1)
    scores = jnp.take(flat, jnp.clip(flat_idx, 0, c_all * hw - 1).reshape(-1),
                      mode="clip").reshape(p, topk, 49)
    center = jnp.take_along_axis(heatf[:p].reshape(p, hw), peak_pos, axis=1)
    return _refine_and_pack(
        scores, center, yy, xx, in_bounds & in_buffer, valid, counts, max_peaks
    )


def _window_coords(peak_pos: jax.Array, h: int, w: int):
    """(C, topk) peak raster positions -> 7x7 window coords + bounds mask.

    Reference bounds quirk kept exactly: both axes checked against *width*,
    strict > 0 (nms_layer.cu:78-94).  yy may exceed h-1 on wide maps — the
    caller resolves those taps as flat-buffer reads into the next channel,
    as the reference's pointer arithmetic does.
    """
    offs = np.stack(np.meshgrid(np.arange(-3, 4), np.arange(-3, 4), indexing="ij"), -1).reshape(-1, 2)
    dys = jnp.asarray(offs[:, 0], jnp.int32)  # (49,)
    dxs = jnp.asarray(offs[:, 1], jnp.int32)
    yy = peak_pos[..., None] // w + dys  # (C, topk, 49)
    xx = peak_pos[..., None] % w + dxs
    in_bounds = (yy > 0) & (yy < w) & (xx > 0) & (xx < w)
    return yy, xx, in_bounds


def _refine_and_pack(scores, center, yy, xx, in_bounds, valid, counts, max_peaks):
    """Score-weighted 7x7 centroid + output packing (nms_layer.cu:74-113)."""
    c, topk = center.shape
    use = in_bounds & (scores > 0)
    scores = jnp.where(use, scores, 0.0)
    wsum = jnp.sum(scores, axis=-1)
    x_acc = jnp.sum(scores * xx.astype(jnp.float32), axis=-1)
    y_acc = jnp.sum(scores * yy.astype(jnp.float32), axis=-1)
    # the reference divides unguarded (nms_layer.cu:97-98): a peak whose 7x7
    # window is fully truncated by the y-vs-width quirk (y >= W+3, only
    # possible on tall/portrait maps) gets 0/0 = NaN coords, score intact.
    # Executed-reference parity (test_ref_gpu_kernel_parity) pins this.
    # Invalid rows also hit 0/0 here but are masked to 0 by `valid` below.
    x_ref = x_acc / wsum
    y_ref = y_acc / wsum

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


def refined_peaks_lowres(
    parts_low: jax.Array,  # (S, h, w, >=P) low-res maps (NHWC); channel P
    # (the next channel after the parts, e.g. background) enables the
    # reference's past-the-channel window reads — pass P+1 channels
    heat: jax.Array,  # (P, th, tw) the upsampled scale-averaged maps
    threshold,
    max_peaks: int,
    start_scale: float,
    scale_gap: float,
) -> jax.Array:
    """NMS peaks with the 7x7 refinement windows *recomputed from low-res*
    via bicubic weight matmuls instead of gathered from the full-res map.

    The upsampled value at integer coords (Y, X) is
    ``mean_n Ay_n[Y] @ src_n @ Ax_n[X]^T`` (see ops/imresize.py), so the 49
    window values per peak become two tiny batched MXU contractions
    (~30 MFLOP) — replacing a 49-tap scalarized gather over the 368x656 map
    that measured ~1 ms/frame.  Used by the estimator's fused program where
    the low-res source is at hand; bit-equality with the gather path is NOT
    guaranteed (same math, different accumulation order) but differences are
    ~1e-6 relative, far inside the 1px/0.01 parity budget.
    """
    c, th, tw = heat.shape
    heatf = heat.astype(jnp.float32)
    mask = find_peaks_mask(heatf, threshold)
    kb = block_keys(mask, th, tw)
    peak_pos, valid, counts = compact_keys(kb.reshape(c, -1), th * tw, max_peaks)
    return refine_from_low(parts_low, peak_pos, valid, counts, (th, tw),
                           max_peaks, start_scale, scale_gap)


def refine_from_low(
    parts_low: jax.Array,  # (S, h, w, >=P) low-res maps (NHWC)
    peak_pos: jax.Array,  # (P, topk) raster positions from compact_keys
    valid: jax.Array,
    counts: jax.Array,
    target_hw: Tuple[int, int],
    max_peaks: int,
    start_scale: float,
    scale_gap: float,
) -> jax.Array:
    """The 7x7 centroid-refinement + packing half of
    :func:`refined_peaks_lowres`, taking compacted peak positions directly —
    so the peak *mask* may come from either the XLA chain
    (find_peaks_mask -> block_keys -> compact_keys) or the fused Pallas
    kernel (ops/nms_pallas.peak_mask_fused -> block_keys -> compact_keys)."""
    from .imresize import axis_weights_dense, scale_pads

    s, h, w, p_all = parts_low.shape
    th, tw = target_hw
    c, topk = peak_pos.shape

    yy, xx, in_bounds = _window_coords(peak_pos, th, tw)
    # 49 = dy-major: yy varies along the dy axis, xx along the dx axis
    yyr = yy.reshape(c, topk, 7, 7)[:, :, :, 0]  # (C, topk, 7), unclamped
    xxc = jnp.clip(xx, 0, tw - 1).reshape(c, topk, 7, 7)[:, :, 0, :]  # (C, topk, 7)
    src = parts_low.astype(jnp.float32)
    planes = jnp.moveaxis(src, -1, 1)  # (S, C_all, h, w)
    # window rows past the channel bottom (yy >= th, wide maps only) read
    # channel c+1 at row yy-th in the reference's contiguous buffer; we
    # replicate when the caller provided the extra channel(s)
    has_next = p_all > c
    if has_next:
        assert tw <= 2 * th, (
            "channel-continuation refinement supports one channel of "
            "overflow (tw <= 2*th); production maps always satisfy this"
        )
        over = yyr >= th
        y_main = jnp.where(over, th - 1, yyr)
        y_next = jnp.clip(yyr - th, 0, th - 1)
    else:
        y_main = jnp.clip(yyr, 0, th - 1)
        in_bounds = in_bounds & (yy < th)

    win = jnp.zeros((c, topk, 7, 7), jnp.float32)
    for n in range(s):
        padh, padw = scale_pads(h, w, n, start_scale, scale_gap)
        Yw = axis_weights_dense(y_main.reshape(-1), h, padh, th).reshape(c, topk * 7, h)
        Xw = axis_weights_dense(xxc.reshape(-1), w, padw, tw).reshape(c, topk, 7, w)
        t1 = jnp.einsum(
            "cmh,chw->cmw", Yw, planes[n, :c],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(c, topk, 7, w)
        if has_next:
            Yw_n = axis_weights_dense(y_next.reshape(-1), h, padh, th).reshape(c, topk * 7, h)
            t1n = jnp.einsum(
                "cmh,chw->cmw", Yw_n, planes[n, 1 : c + 1],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(c, topk, 7, w)
            t1 = jnp.where(over[..., None], t1n, t1)
        win = win + jnp.einsum(
            "ckyw,ckxw->ckyx", t1, Xw,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    win = win / s

    scores = win.reshape(c, topk, 49)
    center = win[:, :, 3, 3]
    return _refine_and_pack(scores, center, yy, xx, in_bounds, valid, counts, max_peaks)
