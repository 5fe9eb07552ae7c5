"""Framework-level training benchmark: CaffeNet, batch 256, 20 iterations
— the reference's own published hardware benchmark
(/root/reference/docs/performance_hardware.md:18-24: K40 26.5 s standard /
19.2 s cuDNN per 20 iters = 5,120 images; Titan 26.26/20.25 s).

Run from the repo root on the TPU:  python scripts/bench_caffenet.py
Prints one JSON line {"seconds_per_20_iters": ..., "imgs_per_sec": ...}.
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


if __name__ == "__main__":
    main()
