"""Fused Pallas kernel: bicubic part-channel upsample + peak stencil.

The hot post-network path (ops/imresize.py -> ops/nms.py) under plain XLA
materializes the (C, 368, 656) f32 upsampled maps to HBM, then reads them
back ~10x (8 shifted neighbor compares + key build + 2x2 block reduce).
This kernel fuses the whole front half per 128x128 spatial tile in VMEM,
processing ALL part channels in one program (grid = spatial tiles only, so
the MXU sees one large (130, 46) @ (46, 82*C) contraction per scale instead
of hundreds of slivers):

    T      = Ay_s[tile+halo] @ L_s                                   (MXU)
    U_c    = mean_s  T[:, c-block] @ Ax_s[tile+halo]^T               (MXU)
    mask_c = U_c > threshold  &  strictly > all 8 neighbors (halo-exact)
    key_c  = mask_c ? H*W - raster_pos : 0
    KB_c   = 2x2 block-max of key_c  (two strict maxima never share a block)

and writes U once plus the ~16x-smaller key blocks.  Downstream (top_k
compaction, 7x7 centroid refinement) stays in XLA and is unchanged — results
are bit-comparable with the reference chain (same Catmull-Rom matrices,
same strict-neighbor rule, same raster keys as ops/nms.find_peaks_mask +
ops/imresize.imresize_average).

Layout notes (Mosaic): the 2x2 block-max avoids shape casts — pairwise max
via pltpu.roll, then even row/lane selection as tiny selector matmuls (keys
< 2^24 are exact in f32).  Halos come from interpolation matrices pre-padded
with one zero row per side, so every tile reads a (TILE+2)-row window with
no edge cases; global border rows/cols are excluded by an index mask
(borders are never peaks, nms_layer.cu:15-46).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .imresize import _matrices

TILE = 128

_EVEN_ROWS = np.zeros((TILE // 2, TILE), np.float32)
_EVEN_ROWS[np.arange(TILE // 2), 2 * np.arange(TILE // 2)] = 1.0
_EVEN_LANES = np.zeros((TILE, TILE), np.float32)
_EVEN_LANES[2 * np.arange(TILE // 2), np.arange(TILE // 2)] = 1.0


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@lru_cache(maxsize=32)
def _padded_matrices(H: int, W: int, th: int, tw: int, s: int,
                     start_scale: float, scale_gap: float):
    """(Ay_pad (S, 1+THpad+1, H), Ax_pad (S, 1+TWpad+1, W)) with zero halo
    rows; row i corresponds to output coordinate i-1."""
    Ay, Ax = _matrices(H, W, th, tw, s, start_scale, scale_gap)
    thp, twp = _round_up(th, TILE), _round_up(tw, TILE)
    ay = np.zeros((s, thp + 2, Ay.shape[2]), np.float32)
    ax = np.zeros((s, twp + 2, Ax.shape[2]), np.float32)
    ay[:, 1 : 1 + th] = Ay
    ax[:, 1 : 1 + tw] = Ax
    return ay, ax


@lru_cache(maxsize=32)
def _whole_matrices(H: int, W: int, th: int, tw: int, s: int,
                    start_scale: float, scale_gap: float):
    """(Ay_pad (S, th+2, H), Ax_pad (S, tw+2, W)) with one zero halo row per
    side (no TILE rounding — for the whole-frame kernel); row i corresponds
    to output coordinate i-1."""
    Ay, Ax = _matrices(H, W, th, tw, s, start_scale, scale_gap)
    ay = np.zeros((s, th + 2, Ay.shape[2]), np.float32)
    ax = np.zeros((s, tw + 2, Ax.shape[2]), np.float32)
    ay[:, 1 : 1 + th] = Ay
    ax[:, 1 : 1 + tw] = Ax
    return ay, ax


def _kernel(th_ref, l_ref, ay_ref, ax_ref, el_ref, er_ref, u_ref, kb_ref,
            acc_ref, *, S, C, W_SRC, H, W):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ty = pl.program_id(0)
    tx = pl.program_id(1)

    for n in range(S):  # static scale loop
        ay_t = ay_ref[n, pl.ds(ty * TILE, TILE + 2), :]  # (130, h_src)
        ax_t = ax_ref[n, pl.ds(tx * TILE, TILE + 2), :]  # (130, w_src)
        # one large MXU contraction over all channels:
        # (130, h_src) @ (h_src, C*w_src) -> (130, C*w_src)
        t = jnp.dot(ay_t, l_ref[n], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        for c in range(C):
            part = jnp.dot(t[:, c * W_SRC : (c + 1) * W_SRC], ax_t.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            if n == 0:
                acc_ref[c] = part
            else:
                acc_ref[c] = acc_ref[c] + part

    thr = th_ref[0, 0]
    rows = ty * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    cols = tx * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    interior = (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)
    raster = jnp.where(interior, H * W - (rows * W + cols), 0)
    el = el_ref[:]  # (64, 128): picks even rows
    er = er_ref[:]  # (128, 128): picks even lanes (zero-padded)

    for c in range(C):
        u_ext = acc_ref[c] * (1.0 / S)
        u = u_ext[1 : 1 + TILE, 1 : 1 + TILE]
        u_ref[c] = u
        mask = u > thr
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                mask &= u > u_ext[1 + dy : 1 + dy + TILE, 1 + dx : 1 + dx + TILE]
        key = jnp.where(mask, raster, 0)
        # 2x2 block max without shape casts (see module docstring)
        kf = key.astype(jnp.float32)
        rmax = jnp.maximum(kf, pltpu.roll(kf, shift=TILE - 1, axis=0))
        rsel = jnp.dot(el, rmax, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (64, 128)
        cmax = jnp.maximum(rsel, pltpu.roll(rsel, shift=TILE - 1, axis=1))
        kb = jnp.dot(cmax, er, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (64, 128)
        kb_ref[c, 0] = kb.astype(jnp.int32)


def _mask_kernel_chan(th_ref, l_ref, ay_ref, ax_ref, m_ref, ts_ref,
                      *, S, C, W_SRC, H, W):
    """Channel-grid upsample + strict-peak stencil (one program per part).

    Profiling the tiled `_mask_kernel` (scripts/repro_post3.py +
    scripts/bench_mask_v2.py ablations, v5e) showed its cost is NOT matmuls
    or HBM: an *empty* 18-program tiled kernel already costs ~110 us/frame
    in per-grid-step pipeline overhead (whole-array VMEM operands re-staged
    per step), and the 18x18 tiny (130,82)@(82,130) stage-2 dots add serial
    issue latency.  This kernel instead runs ONE program per part channel
    over the WHOLE frame: the stage-1 y-pass for all channels is computed
    once per frame (at the first channel step) into a scratch that persists
    across grid steps, and each step's x-pass is one medium
    (H+2,w)@(w,W+2) dot followed by the separable strict-max stencil (the
    same form as ops/nms.find_peaks_mask: max distributes over >, f32 max
    is exact, so the mask is bit-identical to the 8-compare form).
    Measured 171 vs 312 us/frame for the whole-frame form; the channel
    grid keeps the same matmul shapes while fitting the i8 output through
    a per-channel block (the grid=1 form OOMed the 16 MB VMEM scope when
    embedded in the full fused program).

    Grid-order note: under vmap the batch dimension is prepended as the
    OUTERMOST grid axis, so within one frame the channel steps run
    back-to-back and the `c == 0` stage-1 recompute happens once per frame
    — pinned on hardware by test_optimized_path (batched Pallas mask ==
    XLA chain per frame).
    """
    import jax.experimental.pallas as pl

    c = pl.program_id(0)
    thr = th_ref[0, 0]

    @pl.when(c == 0)
    def _stage1():
        for n in range(S):
            t = jnp.dot(ay_ref[n], l_ref[n], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (H+2, C*w)
            for cc in range(C):
                ts_ref[n, cc] = t[:, cc * W_SRC : (cc + 1) * W_SRC]

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)

    acc = None
    for n in range(S):
        part = jnp.dot(ts_ref[n, c], ax_ref[n].T,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (H+2, W+2)
        acc = part if acc is None else acc + part
    u_ext = acc * (1.0 / S)
    u = u_ext[1 : 1 + H, 1 : 1 + W]
    # separable strict-8-neighbor max (see ops/nms.find_peaks_mask)
    row3 = jnp.maximum(jnp.maximum(u_ext[:, :W], u_ext[:, 1 : 1 + W]),
                       u_ext[:, 2 : 2 + W])
    vert = jnp.maximum(row3[:H, :], row3[2 : 2 + H, :])
    horz = jnp.maximum(u_ext[1 : 1 + H, :W], u_ext[1 : 1 + H, 2 : 2 + W])
    mask = (u > thr) & (u > jnp.maximum(vert, horz))
    m_ref[0] = (mask & interior).astype(jnp.int8)


def _mask_kernel(th_ref, l_ref, ay_ref, ax_ref, m_ref, acc_ref,
                 *, S, C, W_SRC, H, W):
    """Upsample + strict-8-neighbor stencil only; emits the i8 peak mask.

    Identical matmul structure (and therefore bit-identical U values) to
    :func:`_kernel`, but writes NO full-res heat and NO key blocks: since
    ops/nms.refined_peaks_lowres recomputes the 7x7 refinement windows from
    the low-res maps, the (C, 368, 656) f32 heat map's only remaining
    consumer is this stencil — fusing it here removes the dominant HBM
    tensor of the whole post segment (~110 MB of full-res traffic collapses
    to one 5 MB i8 mask write; scripts/repro_post2.py).  Downstream
    (block_keys -> compact_keys -> refine) stays in XLA with slot order
    exactly equal to the reference's raster-position order.
    """
    import jax.experimental.pallas as pl

    ty = pl.program_id(0)
    tx = pl.program_id(1)

    for n in range(S):  # static scale loop
        ay_t = ay_ref[n, pl.ds(ty * TILE, TILE + 2), :]  # (130, h_src)
        ax_t = ax_ref[n, pl.ds(tx * TILE, TILE + 2), :]  # (130, w_src)
        t = jnp.dot(ay_t, l_ref[n], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        for c in range(C):
            part = jnp.dot(t[:, c * W_SRC : (c + 1) * W_SRC], ax_t.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            if n == 0:
                acc_ref[c] = part
            else:
                acc_ref[c] = acc_ref[c] + part

    thr = th_ref[0, 0]
    rows = ty * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    cols = tx * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    interior = (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)

    for c in range(C):
        u_ext = acc_ref[c] * (1.0 / S)
        u = u_ext[1 : 1 + TILE, 1 : 1 + TILE]
        mask = u > thr
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                mask &= u > u_ext[1 + dy : 1 + dy + TILE, 1 + dx : 1 + dx + TILE]
        m_ref[c] = (mask & interior).astype(jnp.int8)


def peak_mask_fused(
    lowres: jax.Array,  # (S, h, w, C) net-output part channels, NHWC
    target_hw: Tuple[int, int],
    start_scale: float,
    scale_gap: float,
    threshold,
    interpret: bool = False,
) -> jax.Array:
    """(C, th, tw) bool strict-peak mask of the scale-averaged bicubic
    upsample, computed without ever materializing the upsampled maps.

    Bit-equivalent to ``nms.find_peaks_mask(imresize_average(...), thr)``
    (same Catmull-Rom matrices, same contraction order, same strict
    comparisons — pinned by test_optimized_path).  Feed the result to
    ``nms.block_keys`` + ``nms.compact_keys`` exactly like the XLA chain.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, h, w, c = lowres.shape
    th, tw = target_hw

    l_scw = jnp.transpose(lowres.astype(jnp.float32), (0, 1, 3, 2)).reshape(s, h, c * w)
    thr_arr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)

    # channel-grid kernel VMEM estimate: per-channel stage-1 scratch (lanes
    # padded to 128) + stencil temporaries + in/out blocks
    lane = lambda v: _round_up(v, 128)
    est = (s * c * (th + 2) * lane(w) * 4           # ts scratch
           + 5 * (th + 2) * lane(tw + 2) * 4        # stencil temporaries
           + s * (th + 2) * lane(c * w) * 4)        # stage-1 value at c == 0
    if est <= 12 * 2**20:
        ayw, axw = _whole_matrices(h, w, th, tw, s,
                                   float(start_scale), float(scale_gap))
        m = pl.pallas_call(
            partial(_mask_kernel_chan, S=s, C=c, W_SRC=w, H=th, W=tw),
            grid=(c,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # L (S, h, C*w)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Ay_pad (S, th+2, h)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Ax_pad (S, tw+2, w)
            ],
            out_specs=pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, th, tw), jnp.int8),
            scratch_shapes=[pltpu.VMEM((s, c, th + 2, w), jnp.float32)],
            interpret=interpret,
        )(thr_arr, l_scw, jnp.asarray(ayw), jnp.asarray(axw))
        return m != 0

    thp, twp = _round_up(th, TILE), _round_up(tw, TILE)
    ay_np, ax_np = _padded_matrices(h, w, th, tw, s, float(start_scale), float(scale_gap))

    grid = (thp // TILE, twp // TILE)
    m_pad = pl.pallas_call(
        partial(_mask_kernel, S=s, C=c, W_SRC=w, H=th, W=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda ty, tx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # L (S, h, C*w) whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ay_pad whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ax_pad whole
        ],
        out_specs=pl.BlockSpec((c, TILE, TILE), lambda ty, tx: (0, ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, thp, twp), jnp.int8),
        scratch_shapes=[pltpu.VMEM((c, TILE + 2, TILE + 2), jnp.float32)],
        interpret=interpret,
    )(thr_arr, l_scw, jnp.asarray(ay_np), jnp.asarray(ax_np))
    return m_pad[:, :th, :tw] != 0


def upsample_peak_keys(
    lowres: jax.Array,  # (S, h, w, C) net-output part channels, NHWC
    target_hw: Tuple[int, int],
    start_scale: float,
    scale_gap: float,
    threshold,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (heat (C, th, tw) f32 scale-averaged upsample,
    keys (C, n_key_slots) i32 flat block-maxed raster-key pool for
    ops/nms.peaks_from_keys — zero entries mean "no peak")."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, h, w, c = lowres.shape
    th, tw = target_hw
    thp, twp = _round_up(th, TILE), _round_up(tw, TILE)
    ay_np, ax_np = _padded_matrices(h, w, th, tw, s, float(start_scale), float(scale_gap))

    # (S, h, C*w): channel-major blocks so T slices per channel are contiguous
    l_scw = jnp.transpose(lowres.astype(jnp.float32), (0, 1, 3, 2)).reshape(s, h, c * w)
    thr_arr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)

    grid = (thp // TILE, twp // TILE)
    out = pl.pallas_call(
        partial(_kernel, S=s, C=c, W_SRC=w, H=th, W=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda ty, tx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # L (S, h, C*w) whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ay_pad whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ax_pad whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # even-row selector
            pl.BlockSpec(memory_space=pltpu.VMEM),  # even-lane selector
        ],
        out_specs=[
            pl.BlockSpec((c, TILE, TILE), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, 1, TILE // 2, TILE),
                lambda ty, tx, _nx=twp // TILE: (0, ty * _nx + tx, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, thp, twp), jnp.float32),
            jax.ShapeDtypeStruct(
                (c, (thp // TILE) * (twp // TILE), TILE // 2, TILE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((c, TILE + 2, TILE + 2), jnp.float32)],
        interpret=interpret,
    )(thr_arr, l_scw, jnp.asarray(ay_np), jnp.asarray(ax_np),
      jnp.asarray(_EVEN_ROWS), jnp.asarray(_EVEN_LANES))
    u_pad, kb_tiles = out
    # keys from padding tiles are all zero (interior mask), so the flat key
    # pool is directly consumable by peaks_from_keys
    return u_pad[:, :th, :tw], kb_tiles.reshape(c, -1)
