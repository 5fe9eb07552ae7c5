"""Measure device-program time of the fused pose program (batch=8),
isolating compute from transfers: upload once, run the compiled fn many
times on the same device array, block on a tiny sum.

Usage: python scripts/profile_program.py [--trace DIR]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scales", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    est = PoseEstimator(
        COCO_PROTO, net_resolution=(656, 368), num_scales=args.scales,
        dtype=jnp.bfloat16, seed=0, input_u8=True, pair_cap=32,
        batch=args.batch,
    )
    rs = np.random.RandomState(0)
    x = (rs.rand(args.batch, args.scales, 368, 656, 3) * 255).astype(np.uint8)
    xd = jax.device_put(x)
    nms_thr = jnp.float32(est.params_connect.nms_threshold)
    inter_thr = jnp.float32(est.params_connect.inter_threshold)

    t0 = time.perf_counter()
    out = est._compiled(est.net.params, xd, nms_thr, inter_thr)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")

    def run_n(n):
        # axon's block_until_ready returns early; chain each call's output
        # into a dependent tiny reduce and fetch it to force a real sync
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = est._compiled(est.net.params, xd, nms_thr, inter_thr)
        np.asarray(jax.device_get(jnp.sum(out["packed"][:1])))
        return (time.perf_counter() - t0) / n

    run_n(3)  # warm
    best = min(run_n(args.iters) for _ in range(3))
    per_frame = best / args.batch * 1e3
    print(f"program: {best*1e3:.2f} ms/call  {per_frame:.3f} ms/frame  "
          f"({args.batch/best:.1f} FPS compute-only)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                out = est._compiled(est.net.params, xd, nms_thr, inter_thr)
            jax.block_until_ready(out)
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
