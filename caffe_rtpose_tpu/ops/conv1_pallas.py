"""Fused Pallas kernel for the pose CNN's conv1 block.

Covers ``conv1_1 (3->64, 3x3, pad 1) -> ReLU -> conv1_2 (64->64, 3x3,
pad 1) -> ReLU -> pool1 (2x2 max, stride 2)`` of the VGG19 trunk
(reference model/coco/pose_deploy_linevec.prototxt layers conv1_1..pool1_stage1).

Why a custom kernel: the per-segment breakdown (scripts/stage_breakdown.py,
docs/performance.md) shows XLA runs this block at ~16% MFU — time there
scales with spatial rows nearly independently of channel count, i.e. the
lowering is iteration/relayout-bound at 3 and 64 channels (the 3-channel
input pads to 128 lanes, and every intermediate round-trips HBM).  This
kernel keeps the whole block in VMEM per 16-row tile:

* XLA pre-builds lane-packed conv1_1 im2col tiles (pad-shift-stack at
  HBM speed, ~15 MB/frame) — narrow-lane VMEM blocks would pad 3->128
  lanes and exhaust VMEM;
* conv1_1 is ONE K=32 contract-last matmul per tile: taps pack onto lanes
  (patch[j, i, 3*(3ky+kx)+c] = x[j+ky, i+kx, c], lanes 27..31 zero);
* conv1_2 accumulates six contract-last matmuls with taps packed pairwise
  on K (3x K=128 + 3x K=64 instead of 9x K=64);
* ReLU, edge masking and the 2x2 max pool (lane-preserving sublane-split
  reshapes + axis max) happen in registers; only the pooled
  (H/2, W/2, 64) output is written back to HBM.

Mosaic constraints that shaped this (probed on v5e): dot_general must
contract the LAST (lane) dim; strided value slices lower to unsupported
gathers; reshapes may split/merge sublane dims but must leave the lane
dim unchanged.

Semantics match ops/nn.py::conv2d + max pool to bf16 rounding (f32
accumulation in a different order, so results can differ by ~1 ulp);
parity vs the XLA chain: tests/test_conv1_pallas.py (interpret) and
scripts/bench_conv1_pallas.py (device).

STATUS: experimental, NOT wired into the estimator.  Measured on a v5e it
LOSES to XLA (1.6 vs 0.70 ms/frame): the XLA-side im2col prep is ~0.49 ms
of narrow-lane HBM traffic, and the kernel body pays Mosaic relayouts
around the multi-free-dim dots and 64-lane-offset patch writes.  Kept as
a working record of the Mosaic constraints for this op family — see
docs/performance.md "Pallas kernel status: conv1 block".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16  # conv-output rows per program (=> 8 pool rows)


def _kernel(xcol_ref, w1p, b1, w2pair, w2sing, b2, out_ref,
            h1b, patch2, *, H, W):
    t = pl.program_id(1)

    # conv1_1: one K=32 contract-last matmul over the host-built im2col
    # tile (xcol[b, t, j, i, 3*(3ky+kx)+c] = padded_x[16t+j+ky, i+kx, c];
    # lanes 27..31 zero).  h1_raw[j, i, n] covers h1 row 16t-1+j, col i-1.
    h1 = jax.lax.dot_general(
        xcol_ref[0, 0], w1p[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (18, W+2, 64)
    h1 = jnp.maximum(h1 + b1[0][None, None, :], 0.0)

    # zero the h1 entries that are conv1_2 PADDING, not conv1_1 outputs:
    # rows 16t-1+j outside [0, H), cols i-1 outside [0, W)
    row = t * TILE - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (TILE + 2, W + 2, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE + 2, W + 2, 1), 1)
    ok = (row >= 0) & (row < H) & (col >= 1) & (col < W + 1)
    h1b[...] = jnp.where(ok, h1, 0.0).astype(jnp.bfloat16)

    # conv1_2: 6 contract-last matmuls, taps packed pairwise on K.  out
    # row k reads h1b rows k..k+2, col m reads h1b cols m..m+2.
    acc = jnp.zeros((TILE, W, 64), jnp.float32) + b2[0][None, None, :]
    for ky in range(3):
        patch2[:, :, :64] = h1b[ky:ky + TILE, 0:W, :]
        patch2[:, :, 64:] = h1b[ky:ky + TILE, 1:W + 1, :]
        acc += jax.lax.dot_general(
            patch2[...], w2pair[ky], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            h1b[ky:ky + TILE, 2:W + 2, :], w2sing[ky],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc, 0.0)

    # pool1: 2x2 stride-2 max via lane-preserving sublane-split reshapes
    # (strided slices would lower to unsupported gathers)
    hr = jnp.max(h2.reshape(TILE // 2, 2, W, 64), axis=1)
    p = jnp.max(hr.reshape(TILE // 2, W // 2, 2, 64), axis=2)
    out_ref[0, 0] = p.astype(jnp.bfloat16)


def conv1_block_pallas(x, w1, b1, w2, b2, *, interpret: bool = False):
    """x: (B, H, W, 3) bf16 normalized image (NHWC physical).
    w1: (3,3,3,64) HWIO; w2: (3,3,64,64) HWIO; b1/b2: (64,).
    Returns pool1 activations (B, H//2, W//2, 64) bf16."""
    B, H, W, _ = x.shape
    assert H % TILE == 0 and W % 2 == 0, (H, W)
    n_tiles = H // TILE

    # 2-pixel zero border: 1 for conv1_1's own pad, 1 more so conv1_2's
    # halo taps read true conv1_1 values with zeros past the edge.  The
    # conv1_1 im2col runs in XLA (pad-shift-stack at HBM speed): narrow-
    # lane arrays (3 or 27 wide) as VMEM blocks would pad to 128 lanes
    # and blow VMEM, so the kernel takes lane-packed 32-wide tap tiles,
    # pre-cut into the non-overlapping (TILE+2)-row windows each grid
    # step needs (overlap materialized host-side, ~12% extra bytes).
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (2, 2), (2, 2), (0, 0)))
    taps = jnp.concatenate(
        [xp[:, ky:ky + H + 2, kx:kx + W + 2, :]
         for ky in range(3) for kx in range(3)], axis=-1)  # (B,H+2,W+2,27)
    taps = jnp.pad(taps, ((0, 0), (0, 0), (0, 0), (0, 5)))
    xcol = jnp.stack(
        [taps[:, t * TILE:t * TILE + TILE + 2] for t in range(n_tiles)],
        axis=1)  # (B, n_tiles, TILE+2, W+2, 32)
    w1p = jnp.zeros((32, 64), jnp.float32).at[:27].set(
        w1.astype(jnp.float32).reshape(27, 64)).astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16)
    w2pair = jnp.concatenate([w2b[:, 0], w2b[:, 1]], axis=1)  # (3,128,64)
    w2sing = w2b[:, 2]                                        # (3,64,64)
    b1r = b1.astype(jnp.float32).reshape(1, 64)
    b2r = b2.astype(jnp.float32).reshape(1, 64)

    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, H=H, W=W),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE + 2, W + 2, 32),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((32, 64)),
            wspec((1, 64)),
            wspec((3, 128, 64)),
            wspec((3, 64, 64)),
            wspec((1, 64)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE // 2, W // 2, 64),
            lambda b, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles, TILE // 2, W // 2, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((TILE + 2, W + 2, 64), jnp.bfloat16),      # h1b
            pltpu.VMEM((TILE, W, 128), jnp.bfloat16),             # patch2
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xcol, w1p, b1r, w2pair, w2sing, b2r
      ).reshape(B, H // 2, W // 2, 64)
