"""Hardware timing + parity: fused Pallas conv1-block kernel vs XLA.

Runs both implementations of conv1_1->relu->conv1_2->relu->pool1 at the
production shape (batch 8, 368x656, bf16) with the dispatch-free in-graph
loop, prints ms/frame each, and checks parity on device.

Usage: python scripts/bench_conv1_pallas.py [--batch 8] [--n 20]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()
    B, N = args.batch, args.n

    from caffe_rtpose_tpu.ops.conv1_pallas import conv1_block_pallas
    from caffe_rtpose_tpu.ops.nn import conv2d

    rs = np.random.RandomState(0)
    x = jax.device_put(
        (rs.rand(B, 368, 656, 3).astype(np.float32) - 0.5)).astype(jnp.bfloat16)
    w1 = jax.device_put(rs.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    b1 = jax.device_put(rs.randn(64).astype(np.float32) * 0.1)
    w2 = jax.device_put(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jax.device_put(rs.randn(64).astype(np.float32) * 0.1)

    def native(x):
        h = jnp.maximum(conv2d(x, w1, b1, stride=(1, 1), pad=(1, 1)), 0)
        h = jnp.maximum(conv2d(h, w2, b2, stride=(1, 1), pad=(1, 1)), 0)
        return jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def pallas(x):
        return conv1_block_pallas(x, w1, b1, w2, b2)

    a = np.asarray(jax.jit(native)(x), np.float32)
    b = np.asarray(jax.jit(pallas)(x), np.float32)
    tol = np.maximum(np.maximum(np.abs(a), np.abs(b)) * 2 ** -7, 2 ** -13)
    print("parity on device:", "OK" if (np.abs(a - b) <= tol).all()
          else f"FAIL max diff {np.abs(a - b).max()}")

    from scripts._timing import timed_loop

    def bench(body):
        return timed_loop(body, x, n=N, unit=B)

    tn = bench(native)
    tp = bench(pallas)
    print(f"XLA chain    : {tn:.3f} ms/frame")
    print(f"Pallas fused : {tp:.3f} ms/frame  ({tn / tp:.2f}x)")


if __name__ == "__main__":
    main()
