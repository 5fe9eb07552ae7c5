"""True device-time measurement of the fused pose program.

Per-dispatch overhead over the axon tunnel is ~1.6 ms/call (measured with a
tiny x+1 program), which contaminates call-loop timings such as
scripts/ablate_program.py.  This tool instead runs N iterations of the FULL
fused estimator program inside one ``lax.fori_loop`` — a single dispatch —
and reports wall/N.  The input image is XOR-perturbed by the loop index so
XLA cannot hoist the loop-invariant body.

Usage: python scripts/measure_device_ms.py [--batch 8] [--n 20]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--flops", type=float, default=485e9,
                    help="FLOPs/frame for the MFU line (COCO 368x656)")
    ap.add_argument("--peak", type=float, default=197e12,
                    help="chip peak bf16 FLOP/s (v5e)")
    args = ap.parse_args()
    B, N = args.batch, args.n

    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    est = PoseEstimator(
        COCO_PROTO, net_resolution=(656, 368), num_scales=1,
        dtype=jnp.bfloat16, seed=0, input_u8=True, pair_cap=32, batch=B)

    rs = np.random.RandomState(0)
    img = jax.device_put((rs.rand(B, 1, 368, 656, 3) * 255).astype(np.uint8))
    nms_thr = jnp.float32(est.params_connect.nms_threshold)
    inter_thr = jnp.float32(est.params_connect.inter_threshold)
    fwd = est._raw_fn  # unjitted batched program (params, img, thr, ithr)
    params = est.net.params

    from scripts._timing import timed_loop

    per_frame = timed_loop(
        lambda x: fwd(params, x, nms_thr, inter_thr), img, n=N, unit=B)
    mfu = args.flops / (per_frame * 1e-3) / args.peak
    print(f"device program: {per_frame:.3f} ms/frame "
          f"(batch {B}, {N}-deep in-graph loop, best of 5)")
    print(f"MFU (whole program, {args.flops/1e9:.0f} GFLOP/frame, "
          f"{args.peak/1e12:.0f} TFLOP/s peak): {mfu*100:.1f}%")


if __name__ == "__main__":
    main()
