"""Benchmark: end-to-end pose inference FPS at the reference default config
(656x368 net resolution, 1 scale, COCO 18-kpt model — rtpose.cpp:63-64).

Measures the full per-frame path on one TPU chip with the production pipeline
shape (mirroring the reference's producer / GPU-worker / reorder thread
architecture, rtpose.cpp:1459-1549): a dispatch thread uploads u8 frames and
launches the fused device program (CNN + part-channel bicubic upsample + NMS
+ PAF pair scoring in one XLA program); a pool of fetcher threads pulls the
byte-packed results and runs greedy limb assembly on host.

Baseline: the driver-set north star of 30 FPS/chip (BASELINE.md).
Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"
BASELINE_FPS = 30.0


def main():
    import jax.numpy as jnp

    from caffe_rtpose_tpu.pose import connect as C
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    est = PoseEstimator(
        COCO_PROTO,
        net_resolution=(656, 368),
        num_scales=1,
        dtype=jnp.bfloat16,
        seed=0,
        input_u8=True,
    )

    rs = np.random.RandomState(0)
    frames = [
        (rs.rand(1, 368, 656, 3) * 255).astype(np.uint8) for _ in range(4)
    ]
    pc = est.params_connect
    scale_xy = (1280 / 656.0, 720 / 368.0)

    def dispatch(x):
        return est.run_device(x)

    def finish(out):
        peaks, ps, count = est.fetch(out)
        return C.assemble_fast(peaks, ps, count, est.descriptor, pc, scale_xy=scale_xy)

    for i in range(3):  # warmup / compile
        finish(dispatch(frames[i % len(frames)]))

    N_FETCHERS, DEPTH, N = 4, 8, 120
    work = queue.Queue(maxsize=DEPTH)
    results = [None] * N

    def producer():
        for i in range(N):
            work.put((i, dispatch(frames[i % len(frames)])))
        for _ in range(N_FETCHERS):
            work.put(None)

    def fetcher():
        while True:
            item = work.get()
            if item is None:
                return
            i, out = item
            results[i] = finish(out)

    threads = [threading.Thread(target=fetcher) for _ in range(N_FETCHERS)]
    t0 = time.perf_counter()
    prod = threading.Thread(target=producer)
    prod.start()
    for t in threads:
        t.start()
    prod.join()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    fps = N / dt

    print(json.dumps({
        "metric": "pose_fps_656x368_1scale",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
