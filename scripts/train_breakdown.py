"""Dispatch-free breakdown of the CPM training step on one chip.

Times three nested programs with the in-graph-loop method
(measure_device_ms.py): forward loss only, forward+backward grads, and the
full SGD+momentum+weight-decay update.  Reports per-image ms and training
MFU, where fwd+bwd FLOPs are taken as 3x the forward conv FLOPs (the
standard 1:2 forward:backward ratio — both grad convs mirror the forward
MACs).

Usage: python scripts/train_breakdown.py [--batch 10] [--crop 368]
       [--dtype bf16|f32] [--remat none|convs]
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
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--crop", type=int, default=368)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--remat", default="none", choices=["none", "convs"])
    ap.add_argument("--peak", type=float, default=197e12,
                    help="chip peak FLOP/s (197e12 bf16 / 98.5e12 f32 v5e)")
    args = ap.parse_args()
    B, N = args.batch, args.n

    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.models.cpm import make_pose_train_net
    from caffe_rtpose_tpu.training.solver import Solver

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    peak = args.peak if args.dtype == "bf16" else min(args.peak, 98.5e12)
    proto = make_pose_train_net(batch=B, crop=args.crop)
    net = Net(proto, phase="TRAIN", seed=0, dtype=dtype, remat=args.remat)
    loss_fn = net.make_loss_fn()
    solver = Solver(
        "base_lr: 2e-5 lr_policy: 'fixed' momentum: 0.9 weight_decay: 5e-4",
        net, lambda it: {})

    # forward conv FLOPs of the train graph (per batch)
    fl_fwd = 0.0
    for impl in net.impls:
        if impl.type == "Convolution":
            n, _, h, w = net.blob_shape(impl.tops[0])
            fl_fwd += 2.0 * n * h * w * int(np.prod(
                np.asarray(net.params[impl.name][0]).shape))
    fl_bwd_total = 3.0 * fl_fwd

    update_fn = solver._update.__wrapped__
    history = solver.history

    rs = np.random.RandomState(0)
    grid = args.crop // 8
    # physical NHWC inputs (blob_infos mark 4-D inputs nhwc)
    data = jax.device_put(
        (rs.rand(B, args.crop, args.crop, 3).astype(np.float32) - 0.5)
        .astype(np.float32)).astype(dtype)
    label = jax.device_put(
        (rs.rand(B, grid, grid, 114) > 0.7).astype(np.float32)).astype(dtype)
    rng = jax.random.PRNGKey(0)
    params = net.params
    lr = jnp.float32(2e-5)

    def timed(step, *state):
        @jax.jit
        def loop(data, label, *state):
            def body(i, carry):
                return step(data + (i & 1).astype(data.dtype) * 1e-6,
                            label, *carry)
            return jax.lax.fori_loop(0, N, body, state)
        # sync on the scalar accumulator via device_get (axon's
        # block_until_ready can return early for some programs)
        np.asarray(jax.device_get(loop(data, label, *state)[-1]))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(loop(data, label, *state)[-1]))
            ts.append(time.perf_counter() - t0)
        return min(ts) / N / B * 1e3  # ms per image

    def fwd_step(data, label, params, acc):
        l = loss_fn(params, {"data": data, "label": label}, rng)
        return params, acc + l

    def grad_step(data, label, params, acc):
        l, g = jax.value_and_grad(loss_fn)(
            params, {"data": data, "label": label}, rng)
        # touch every grad so nothing is DCE'd (tiny scale, NOT *0 — XLA
        # folds x*0 and then dead-codes the whole backward)
        s = sum(jnp.sum(x) for lay in g.values() for x in lay)
        return params, acc + l + s.astype(jnp.float32) * 1e-30

    def full_step(data, label, params, history, acc):
        l, g = jax.value_and_grad(loss_fn)(
            params, {"data": data, "label": label}, rng)
        params, history = update_fn(params, g, history, lr, 0)
        return params, history, acc + l

    z = jnp.float32(0.0)
    t_f = timed(fwd_step, params, z)
    t_g = timed(grad_step, params, z)
    t_u = timed(full_step, params, history, z)

    def row(name, ms, fl):
        mfu = fl / B / (ms * 1e-3) / peak
        print(f"{name:<26} {ms:7.2f} ms/img   {fl/B/1e9:6.0f} GF/img   "
              f"MFU {mfu*100:5.1f}%")

    print(f"batch={B} crop={args.crop} dtype={args.dtype} "
          f"remat={args.remat} peak={peak/1e12:.0f}T")
    row("forward loss", t_f, fl_fwd)
    row("forward+backward", t_g, fl_bwd_total)
    row("+ SGD update", t_u, fl_bwd_total)
    print(f"backward-only: {t_g - t_f:.2f} ms/img "
          f"({(t_g - t_f) / t_f:.2f}x forward)")
    print(f"optimizer: {t_u - t_g:.2f} ms/img")
    print(f"step throughput: {1e3 / (t_u * B):.2f} iters/s = "
          f"{1e3 / t_u:.1f} imgs/s (compute only)")


if __name__ == "__main__":
    main()
