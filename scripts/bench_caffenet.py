"""Framework-level benchmark: CaffeNet, batch 256 — the reference's own
published hardware benchmark
(/root/reference/docs/performance_hardware.md:18-24: training K40 26.5 s
standard / 19.2 s cuDNN per 20 iters = 5,120 images; Titan 26.26/20.25 s;
TESTING K40+cuDNN 60.7 s / 50,000 val images = 824 imgs/s).

Run from the repo root on the TPU:
    python scripts/bench_caffenet.py            # training benchmark
    python scripts/bench_caffenet.py --test     # forward-only (testing)
Prints one JSON line per mode.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=256, iters=20, warmup=3):
    import jax

    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.models.caffenet import make_caffenet
    from caffe_rtpose_tpu.training.solver import Solver

    net = Net(make_caffenet(batch=batch), phase="TRAIN", seed=0)
    solver_param = {
        "base_lr": 0.01, "momentum": 0.9, "weight_decay": 0.0005,
        "lr_policy": "fixed", "max_iter": iters + warmup, "display": 0,
    }
    rs = np.random.RandomState(0)
    data = rs.randint(0, 256, (batch, 3, 227, 227)).astype(np.float32)
    label = rs.randint(0, 1000, (batch,)).astype(np.float32)
    # pre-stage on device: the reference benchmark reads a local LMDB next
    # to a PCIe GPU; this chip sits behind a ~32 MB/s tunnel, and shipping
    # 158 MB of input per iteration would measure the tunnel, not the
    # training step
    import jax as _jax

    staged = {"data": _jax.device_put(data), "label": _jax.device_put(label)}

    def data_fn(it):
        return staged

    solver = Solver(solver_param, net, data_fn)
    solver.step(warmup)  # compile + settle
    jax.block_until_ready(jax.tree_util.tree_leaves(solver.net.params))
    t0 = time.perf_counter()
    solver.step(iters)
    jax.block_until_ready(jax.tree_util.tree_leaves(solver.net.params))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "model": "CaffeNet b256",
        "seconds_per_20_iters": round(dt * 20 / iters, 2),
        "imgs_per_sec": round(batch * iters / dt, 1),
        "ref_k40_cudnn_s": 19.2, "ref_k40_s": 26.5,
        "speedup_vs_k40_cudnn": round(19.2 / (dt * 20 / iters), 2),
    }))


def main_test(batch=256, iters=40, warmup=3):
    """Forward-only scoring throughput (the reference's 'testing' row:
    TEST-phase net, prob + accuracy heads, docs/performance_hardware.md:24)."""
    import jax
    import jax.numpy as jnp

    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.models.caffenet import make_caffenet

    net = Net(make_caffenet(batch=batch, phase="TEST"), phase="TEST", seed=0)
    rs = np.random.RandomState(0)
    from caffe_rtpose_tpu.ops import layout as lay

    data = jax.device_put(lay.to_physical(
        rs.randint(0, 256, (batch, 3, 227, 227)).astype(np.float32)))
    label = jax.device_put(rs.randint(0, 1000, (batch,)).astype(np.float32))
    outs = net.output_names()  # loss + accuracy, like `caffe test`

    def fwd(d, l):
        blobs = net._apply(net.params, {"data": d, "label": l},
                           jax.random.PRNGKey(0), None, False)
        return sum(jnp.sum(blobs[o]) for o in outs)

    fwd = jax.jit(fwd)
    np.asarray(jax.device_get(fwd(data, label)))
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(iters):
        s = s + fwd(data, label)
    np.asarray(jax.device_get(s))
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    print(json.dumps({
        "model": "CaffeNet b256 forward (TEST)",
        "imgs_per_sec": round(ips, 1),
        "seconds_per_50k_imgs": round(50000 / ips, 2),
        "ref_k40_cudnn_s_per_50k": 60.7,
        "speedup_vs_k40_cudnn": round(60.7 / (50000 / ips), 2),
    }))


if __name__ == "__main__":
    if "--test" in sys.argv:
        main_test()
    else:
        main()
