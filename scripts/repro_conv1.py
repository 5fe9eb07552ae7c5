"""Standalone repro of the conv1-block efficiency floor (VERDICT r3 #4).

The per-segment breakdown (scripts/stage_breakdown.py, docs/performance.md)
shows the conv1 block (368x656, 3->64->64 ch) at ~16% MFU while every
deeper segment reaches 51-97%.  This script isolates that block and probes
the lowering axes one at a time, dispatch-free (scripts/_timing.py):

  * each conv alone (3->64 vs 64->64) — where does the time go?
  * channel scaling at fixed spatial (64->64 vs 128->128) — if time is
    ~flat in channels, the lowering is iteration-bound, not MXU-bound;
  * NHWC vs NCHW input layouts and kernel layout permutations;
  * input channel padding 3->8/16 (MXU-friendly C);
  * f32 vs bf16;
  * spatial halving (184x328) — is time ~linear in rows?

Run with XLA_FLAGS to probe compiler options, e.g.:
  XLA_FLAGS=--xla_tpu_use_repeated_instance_for_preferred_prefetch_time=false \
      python scripts/repro_conv1.py

Findings land in docs/performance.md ("conv1 floor").
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import timed_loop


def conv(x, w, dn, out_dtype=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(out_dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--h", type=int, default=368)
    ap.add_argument("--w", type=int, default=656)
    args = ap.parse_args()
    B, H, W = args.batch, args.h, args.w
    rs = np.random.RandomState(0)
    peak = 197e12  # v5e bf16

    def report(name, ms, gflop):
        mfu = gflop * 1e9 / (ms * 1e-3) / peak
        print(f"{name:<42} {ms:7.3f} ms/frame  {mfu*100:5.1f}% MFU", flush=True)

    def wk(kh, kw, ci, co, layout="HWIO"):
        w = (rs.randn(kh, kw, ci, co) * 0.05).astype(np.float32)
        if layout == "OIHW":
            w = w.transpose(3, 2, 0, 1)
        return jax.device_put(jnp.asarray(w, jnp.bfloat16))

    def xin(c, h=H, w=W, fmt="NHWC", dtype=jnp.bfloat16):
        a = (rs.rand(B, h, w, c).astype(np.float32) - 0.5)
        if fmt == "NCHW":
            a = a.transpose(0, 3, 1, 2)
        return jax.device_put(jnp.asarray(a, dtype))

    NHWC = ("NHWC", "HWIO", "NHWC")
    NCHW = ("NCHW", "OIHW", "NCHW")

    gf_11 = 2 * 9 * 3 * 64 * H * W / 1e9      # conv1_1
    gf_12 = 2 * 9 * 64 * 64 * H * W / 1e9     # conv1_2
    gf_128 = 2 * 9 * 128 * 128 * H * W / 1e9

    # --- production block baseline (NHWC bf16)
    w1, w2 = wk(3, 3, 3, 64), wk(3, 3, 64, 64)
    report("block NHWC bf16 (production)", timed_loop(
        lambda x: jnp.maximum(conv(jnp.maximum(conv(x, w1, NHWC), 0), w2, NHWC), 0),
        xin(3), n=args.n, unit=B), gf_11 + gf_12)

    # --- each conv alone
    report("conv1_1 alone (3->64)", timed_loop(
        lambda x: conv(x, w1, NHWC), xin(3), n=args.n, unit=B), gf_11)
    report("conv1_2 alone (64->64)", timed_loop(
        lambda x: conv(x, w2, NHWC), xin(64), n=args.n, unit=B), gf_12)

    # --- channel scaling at fixed spatial: iteration-bound <=> ~flat
    w128 = wk(3, 3, 128, 128)
    report("128->128 same spatial (4x FLOPs)", timed_loop(
        lambda x: conv(x, w128, NHWC), xin(128), n=args.n, unit=B), gf_128)

    # --- spatial halving
    report("conv1_2 at 184x328 (1/4 spatial)", timed_loop(
        lambda x: conv(x, w2, NHWC), xin(64, 184, 328), n=args.n, unit=B),
        gf_12 / 4)

    # --- layouts
    w1n, w2n = wk(3, 3, 3, 64, "OIHW"), wk(3, 3, 64, 64, "OIHW")
    report("block NCHW bf16", timed_loop(
        lambda x: jnp.maximum(conv(jnp.maximum(conv(x, w1n, NCHW), 0), w2n, NCHW), 0),
        xin(3, fmt="NCHW"), n=args.n, unit=B), gf_11 + gf_12)
    report("conv1_2 NCHW", timed_loop(
        lambda x: conv(x, w2n, NCHW), xin(64, fmt="NCHW"), n=args.n, unit=B),
        gf_12)

    # --- input channel padding (C=8 / 16 instead of 3)
    for cpad in (8, 16):
        wp = wk(3, 3, cpad, 64)
        report(f"conv1_1 with C padded 3->{cpad}", timed_loop(
            lambda x, wp=wp: conv(x, wp, NHWC), xin(cpad), n=args.n, unit=B),
            gf_11)

    # --- f32
    w1f = jax.device_put(jnp.asarray(np.asarray(w1), jnp.float32))
    w2f = jax.device_put(jnp.asarray(np.asarray(w2), jnp.float32))
    report("block NHWC f32", timed_loop(
        lambda x: jnp.maximum(conv(jnp.maximum(
            conv(x, w1f, NHWC, jnp.float32), 0), w2f, NHWC, jnp.float32), 0),
        xin(3, dtype=jnp.float32), n=args.n, unit=B), gf_11 + gf_12)

    # --- conv1_2 as 9 shifted matmuls via einsum on (BHW, C) — the MXU
    # sees a [BHW,64]x[64,64] GEMM per tap; measures whether bypassing the
    # conv lowering entirely escapes the iteration bound
    w2taps = jnp.asarray(np.asarray(w2).reshape(9, 64, 64))

    def shifted9(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, 64), jnp.float32)
        k = 0
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.einsum(
                    "bhwc,cd->bhwd", xp[:, dy:dy + H, dx:dx + W, :],
                    w2taps[k], preferred_element_type=jnp.float32)
                k += 1
        return acc.astype(jnp.bfloat16)

    report("conv1_2 as 9 shifted einsum-GEMMs", timed_loop(
        shifted9, xin(64), n=args.n, unit=B), gf_12)


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def extra_probes():
    """Follow-up probes: batch-folded grouped conv + batch scaling."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--extra", action="store_true")
    ap.add_argument("--n", type=int, default=20)
    args, _ = ap.parse_known_args()
    B, H, W = 8, 368, 656
    rs = np.random.RandomState(0)
    peak = 197e12

    def report(name, ms, gflop):
        mfu = gflop * 1e9 / (ms * 1e-3) / peak
        print(f"{name:<42} {ms:7.3f} ms/frame  {mfu*100:5.1f}% MFU", flush=True)

    NHWC = ("NHWC", "HWIO", "NHWC")
    gf_12 = 2 * 9 * 64 * 64 * H * W / 1e9
    w2 = jax.device_put(jnp.asarray(
        (rs.randn(3, 3, 64, 64) * 0.05), jnp.bfloat16))

    # batch folded into channel groups: (B,H,W,64) -> (1,H,W,B*64),
    # feature_group_count=B — gives the lowering a 512-channel tensor
    wgrp = jnp.concatenate([w2] * B, axis=3)  # (3,3,64,512), group g uses w2

    def grouped(x):  # x: (1,H,W,B*64)
        return jax.lax.conv_general_dilated(
            x, wgrp, (1, 1), ((1, 1), (1, 1)), dimension_numbers=NHWC,
            feature_group_count=B,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    xg = jax.device_put(jnp.asarray(
        rs.rand(1, H, W, B * 64).astype(np.float32) - 0.5, jnp.bfloat16))
    report("conv1_2 batch-folded grouped (512ch, g=8)", timed_loop(
        grouped, xg, n=args.n, unit=B), gf_12)

    # batch scaling of the plain conv: per-call overhead shows as falling
    # per-frame time with rising batch
    def conv12(x):
        return jax.lax.conv_general_dilated(
            x, w2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=NHWC,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    for b in (1, 8, 32):
        xb = jax.device_put(jnp.asarray(
            rs.rand(b, H, W, 64).astype(np.float32) - 0.5, jnp.bfloat16))
        report(f"conv1_2 batch={b}", timed_loop(
            conv12, xb, n=max(4, args.n // max(1, b // 8)), unit=b), gf_12)


if __name__ == "__main__" and "--extra" in sys.argv:
    extra_probes()
