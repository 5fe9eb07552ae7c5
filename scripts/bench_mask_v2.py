"""Prototype bench: column-tiled peak-mask kernel vs the shipped one.

The shipped ops/nms_pallas._mask_kernel runs an (3, 6) spatial grid whose
stage-2 x-pass is 18 tiny (130,82)@(82,130) matmuls per program (324 small
MXU calls/frame) — measured 326 us/frame (scripts/repro_post3.py).  This
variant tiles COLUMNS only: each program handles a full 368-row column band,
so stage 2 becomes 18 medium (370,82)@(82,130) matmuls x 6 programs and
stage 1 one (370,46)@(46,1476).  Same y-first contraction per output
element -> bit-identical mask.
"""
import argparse
import sys
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import timed_loop
from caffe_rtpose_tpu.ops.imresize import _matrices
from caffe_rtpose_tpu.ops.nms_pallas import peak_mask_fused

TILE = 128


def _round_up(v, m):
    return (v + m - 1) // m * m


def _mask_kernel_cols(th_ref, l_ref, ay_ref, ax_ref, m_ref,
                      *, S, C, W_SRC, H, W):
    import jax.experimental.pallas as pl

    tx = pl.program_id(0)
    # stage 1 (y-pass), all scales: (H+2, C*w_src) each
    ts = [
        jnp.dot(ay_ref[n], l_ref[n], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        for n in range(S)
    ]
    ax_ts = [ax_ref[n, pl.ds(tx * TILE, TILE + 2), :] for n in range(S)]

    thr = th_ref[0, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, TILE), 0)
    cols = tx * TILE + jax.lax.broadcasted_iota(jnp.int32, (H, TILE), 1)
    interior = (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)

    for c in range(C):
        acc = None
        for n in range(S):
            part = jnp.dot(ts[n][:, c * W_SRC : (c + 1) * W_SRC], ax_ts[n].T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (H+2, 130)
            acc = part if acc is None else acc + part
        u_ext = acc * (1.0 / S)
        u = u_ext[1 : 1 + H, 1 : 1 + TILE]
        mask = u > thr
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                mask &= u > u_ext[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + TILE]
        m_ref[c] = (mask & interior).astype(jnp.int8)


def peak_mask_cols(lowres, target_hw, start_scale, scale_gap, threshold,
                   interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, h, w, c = lowres.shape
    th, tw = target_hw
    twp = _round_up(tw, TILE)
    Ay, Ax = _matrices(h, w, th, tw, s, float(start_scale), float(scale_gap))
    ay = np.zeros((s, th + 2, h), np.float32)
    ay[:, 1 : 1 + th] = Ay
    ax = np.zeros((s, twp + 2, w), np.float32)
    ax[:, 1 : 1 + tw] = Ax

    l_scw = jnp.transpose(lowres.astype(jnp.float32), (0, 1, 3, 2)).reshape(s, h, c * w)
    thr_arr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)

    m_pad = pl.pallas_call(
        partial(_mask_kernel_cols, S=s, C=c, W_SRC=w, H=th, W=tw),
        grid=(twp // TILE,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda tx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, th, TILE), lambda tx: (0, 0, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, th, twp), jnp.int8),
        interpret=interpret,
    )(thr_arr, l_scw, jnp.asarray(ay), jnp.asarray(ax))
    return m_pad[:, :, :tw] != 0


def _mask_kernel_cols128(th_ref, l_ref, ay_ref, ax_ref, m_ref,
                         *, S, C, H, W):
    """Like _mask_kernel_cols but channel blocks are zero-padded to 128
    lanes so every slice is lane-aligned (no relayout)."""
    import jax.experimental.pallas as pl

    tx = pl.program_id(0)
    ts = [
        jnp.dot(ay_ref[n], l_ref[n], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        for n in range(S)
    ]
    ax_ts = [ax_ref[n, pl.ds(tx * TILE, TILE + 2), :] for n in range(S)]

    thr = th_ref[0, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, TILE), 0)
    cols = tx * TILE + jax.lax.broadcasted_iota(jnp.int32, (H, TILE), 1)
    interior = (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)

    for c in range(C):
        acc = None
        for n in range(S):
            part = jnp.dot(ts[n][:, c * 128 : (c + 1) * 128], ax_ts[n].T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (H+2, 130)
            acc = part if acc is None else acc + part
        u_ext = acc * (1.0 / S)
        u = u_ext[1 : 1 + H, 1 : 1 + TILE]
        mask = u > thr
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                mask &= u > u_ext[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + TILE]
        m_ref[c] = (mask & interior).astype(jnp.int8)


def _mask_kernel_ablate(th_ref, l_ref, ay_ref, ax_ref, m_ref,
                        *, S, C, W_SRC, H, W, stencil, prec):
    """Ablation: optionally skip the 8-neighbor stencil (threshold compare
    only) and/or run the matmuls at a lower MXU precision."""
    import jax.experimental.pallas as pl

    tx = pl.program_id(0)
    ts = [
        jnp.dot(ay_ref[n], l_ref[n], preferred_element_type=jnp.float32,
                precision=prec)
        for n in range(S)
    ]
    ax_ts = [ax_ref[n, pl.ds(tx * TILE, TILE + 2), :] for n in range(S)]

    thr = th_ref[0, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, TILE), 0)
    cols = tx * TILE + jax.lax.broadcasted_iota(jnp.int32, (H, TILE), 1)
    interior = (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)

    for c in range(C):
        acc = None
        for n in range(S):
            part = jnp.dot(ts[n][:, c * W_SRC : (c + 1) * W_SRC], ax_ts[n].T,
                           preferred_element_type=jnp.float32,
                           precision=prec)
            acc = part if acc is None else acc + part
        u_ext = acc * (1.0 / S)
        u = u_ext[1 : 1 + H, 1 : 1 + TILE]
        mask = u > thr
        if stencil:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    mask &= u > u_ext[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + TILE]
        m_ref[c] = (mask & interior).astype(jnp.int8)


def _mask_kernel_bf16(th_ref, l_ref, ay_ref, ax_ref, m_ref,
                      *, S, C, W_SRC, H, W):
    """bf16 inputs -> f32 accumulate: guaranteed single MXU pass."""
    import jax.experimental.pallas as pl

    tx = pl.program_id(0)
    ts = [
        jnp.dot(ay_ref[n], l_ref[n], preferred_element_type=jnp.float32)
        for n in range(S)
    ]
    ax_ts = [ax_ref[n, pl.ds(tx * TILE, TILE + 2), :] for n in range(S)]

    thr = th_ref[0, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, TILE), 0)
    cols = tx * TILE + jax.lax.broadcasted_iota(jnp.int32, (H, TILE), 1)
    interior = (rows >= 1) & (rows <= H - 2) & (cols >= 1) & (cols <= W - 2)

    for c in range(C):
        acc = None
        for n in range(S):
            part = jnp.dot(ts[n][:, c * W_SRC : (c + 1) * W_SRC].astype(jnp.bfloat16),
                           ax_ts[n].T, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        u_ext = acc * (1.0 / S)
        u = u_ext[1 : 1 + H, 1 : 1 + TILE]
        mask = u > thr
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                mask &= u > u_ext[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + TILE]
        m_ref[c] = (mask & interior).astype(jnp.int8)


def peak_mask_bf16(lowres, target_hw, start_scale, scale_gap, threshold):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, h, w, c = lowres.shape
    th, tw = target_hw
    twp = _round_up(tw, TILE)
    Ay, Ax = _matrices(h, w, th, tw, s, float(start_scale), float(scale_gap))
    ay = np.zeros((s, th + 2, h), np.float32)
    ay[:, 1 : 1 + th] = Ay
    ax = np.zeros((s, twp + 2, w), np.float32)
    ax[:, 1 : 1 + tw] = Ax

    l_scw = jnp.transpose(lowres.astype(jnp.bfloat16), (0, 1, 3, 2)).reshape(s, h, c * w)
    thr_arr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)

    m_pad = pl.pallas_call(
        partial(_mask_kernel_bf16, S=s, C=c, W_SRC=w, H=th, W=tw),
        grid=(twp // TILE,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda tx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, th, TILE), lambda tx: (0, 0, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, th, twp), jnp.int8),
    )(thr_arr, l_scw, jnp.asarray(ay).astype(jnp.bfloat16), jnp.asarray(ax).astype(jnp.bfloat16))
    return m_pad[:, :, :tw] != 0


def peak_mask_ablate(lowres, target_hw, start_scale, scale_gap, threshold,
                     stencil=True, prec=jax.lax.Precision.HIGHEST):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, h, w, c = lowres.shape
    th, tw = target_hw
    twp = _round_up(tw, TILE)
    Ay, Ax = _matrices(h, w, th, tw, s, float(start_scale), float(scale_gap))
    ay = np.zeros((s, th + 2, h), np.float32)
    ay[:, 1 : 1 + th] = Ay
    ax = np.zeros((s, twp + 2, w), np.float32)
    ax[:, 1 : 1 + tw] = Ax

    l_scw = jnp.transpose(lowres.astype(jnp.float32), (0, 1, 3, 2)).reshape(s, h, c * w)
    thr_arr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)

    m_pad = pl.pallas_call(
        partial(_mask_kernel_ablate, S=s, C=c, W_SRC=w, H=th, W=tw,
                stencil=stencil, prec=prec),
        grid=(twp // TILE,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda tx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, th, TILE), lambda tx: (0, 0, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, th, twp), jnp.int8),
    )(thr_arr, l_scw, jnp.asarray(ay), jnp.asarray(ax))
    return m_pad[:, :, :tw] != 0


def peak_mask_cols128(lowres, target_hw, start_scale, scale_gap, threshold,
                      interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, h, w, c = lowres.shape
    th, tw = target_hw
    twp = _round_up(tw, TILE)
    Ay, Ax = _matrices(h, w, th, tw, s, float(start_scale), float(scale_gap))
    ay = np.zeros((s, th + 2, h), np.float32)
    ay[:, 1 : 1 + th] = Ay
    # Ax^T K-padded: (twp+2, 128) with zero cols beyond w
    ax = np.zeros((s, twp + 2, 128), np.float32)
    ax[:, 1 : 1 + tw, :w] = Ax

    lw = jnp.transpose(lowres.astype(jnp.float32), (0, 1, 3, 2))  # (S,h,C,w)
    lw = jnp.pad(lw, ((0, 0), (0, 0), (0, 0), (0, 128 - w))).reshape(s, h, c * 128)
    thr_arr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)

    m_pad = pl.pallas_call(
        partial(_mask_kernel_cols128, S=s, C=c, H=th, W=tw),
        grid=(twp // TILE,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda tx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, th, TILE), lambda tx: (0, 0, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, th, twp), jnp.int8),
        interpret=interpret,
    )(thr_arr, lw, jnp.asarray(ay), jnp.asarray(ax))
    return m_pad[:, :, :tw] != 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--scales", type=int, default=1)
    args = ap.parse_args()
    B, S = args.batch, args.scales

    P, h, w = 18, 46, 82
    th, tw = 368, 656
    ss, sg = 1.0, 0.3
    thr = jnp.float32(0.05)

    rs = np.random.RandomState(0)
    low = jnp.asarray(rs.rand(B, S, h, w, P).astype(np.float32) * 0.3)

    f0 = jax.jit(jax.vmap(lambda lo: peak_mask_fused(lo, (th, tw), ss, sg, thr)))
    f2 = jax.jit(jax.vmap(lambda lo: peak_mask_cols(lo, (th, tw), ss, sg, thr)))
    f3 = jax.jit(jax.vmap(lambda lo: peak_mask_cols128(lo, (th, tw), ss, sg, thr)))

    m0 = np.asarray(jax.device_get(f0(low)))
    m2 = np.asarray(jax.device_get(f2(low)))
    m3 = np.asarray(jax.device_get(f3(low)))
    print("v2 bit-equal vs shipped:", np.array_equal(m0, m2),
          "| v3:", np.array_equal(m0, m3), "| peaks:", m0.sum())

    P_ = jax.lax.Precision
    f4 = jax.jit(jax.vmap(lambda lo: peak_mask_ablate(
        lo, (th, tw), ss, sg, thr, stencil=False)))
    f6 = jax.jit(jax.vmap(lambda lo: peak_mask_ablate(
        lo, (th, tw), ss, sg, thr, prec=P_.DEFAULT)))
    f7 = jax.jit(jax.vmap(lambda lo: peak_mask_bf16(lo, (th, tw), ss, sg, thr)))

    for name, fn in [("v0 shipped (3x6 grid)", f0), ("v2 column bands", f2),
                     ("v3 cols, lane-aligned", f3),
                     ("v4 no stencil", f4),
                     ("v6 prec DEFAULT", f6),
                     ("v7 bf16 one-pass", f7)]:
        ms = timed_loop(fn, low, n=args.n, unit=B)
        print(f"{name:28s} {ms * 1e3:8.1f} us/frame")


if __name__ == "__main__":
    main()
