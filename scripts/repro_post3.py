"""Post-segment attribution for the PRODUCTION (Pallas mask) chain.

repro_post.py / repro_post2.py attributed the round-4 XLA chain and drove
the two round-5 rewrites (gather-free compact_keys, fused peak-mask Pallas
kernel).  This probe re-attributes the post segment as it now ships
(pose/estimator.py fused-program tail):

  pallas-mask    — ops/nms_pallas.peak_mask_fused (upsample+stencil in VMEM)
  +keys+compact  — + ops/nms.block_keys + compact_keys
  refine         — ops/nms.refine_from_low given compacted positions
  pafscore       — pose/connect.score_pairs_lowres given peaks
  pack           — the bitcast/concat byte-pack given all outputs
  post (all)     — the full composition low -> packed (what the estimator
                   runs after concat_stage7)

Each probe's output feeds the carry reduce so XLA cannot DCE a stage
(scripts/_timing.py).  Run on the real chip; batch matches bench.py.
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import timed_loop

COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()
    B = args.batch

    from caffe_rtpose_tpu.pose import connect as C
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator
    from caffe_rtpose_tpu.ops import nms as N
    from caffe_rtpose_tpu.ops.nms_pallas import peak_mask_fused

    est = PoseEstimator(
        COCO_PROTO, net_resolution=(656, 368), num_scales=1,
        dtype=jnp.bfloat16, seed=0, input_u8=True, pair_cap=32, batch=B)
    net = est.net
    desc = est.descriptor
    P, M = est.num_parts, est.max_peaks
    eff = est.eff_peaks
    th, tw = est.net_h, est.net_w
    ss, sg = est.start_scale, est.scale_gap
    thr = jnp.float32(est.params_connect.nms_threshold)
    ithr = jnp.float32(est.params_connect.inter_threshold)

    rs = np.random.RandomState(0)
    impls = net.prune_for([est.lowres_blob])
    x_u8 = jnp.asarray((rs.rand(B, 1, th, tw, 3) * 255).astype(np.uint8))

    def cnn1(img):
        xf = img.astype(jnp.float32) / 256.0 - 0.5
        blobs = net._apply(net.params, {"image": xf.astype(net.dtype)},
                           jax.random.PRNGKey(0), None, False, impls=impls)
        return blobs[est.lowres_blob]

    low = jax.device_put(np.asarray(jax.device_get(jax.jit(jax.vmap(cnn1))(x_u8))))

    def mask1(lo):
        return peak_mask_fused(lo[..., :P], (th, tw), ss, sg, thr)

    def compact1(lo):
        kbm = N.block_keys(mask1(lo), th, tw)
        return N.compact_keys(kbm.reshape(P, -1), th * tw, M)

    def peaks1(lo):
        ppos, pval, pcnt = compact1(lo)
        pk = N.refine_from_low(lo[..., : P + 1], ppos, pval, pcnt,
                               (th, tw), M, ss, sg)
        return pk[:, : eff + 1]

    peaks = jax.device_put(np.asarray(jax.device_get(jax.jit(jax.vmap(peaks1))(low))))

    def paf1(lo):
        return C.score_pairs_lowres(lo, peaks[0], desc, (th, tw), ss, sg, ithr)

    def pack1(lo):
        pk = peaks1(lo)
        sc, cnt = C.score_pairs_lowres(lo, pk, desc, (th, tw), ss, sg, ithr)
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(pk.reshape(-1), jnp.uint8).reshape(-1),
            jax.lax.bitcast_convert_type(
                sc.astype(jnp.float16).reshape(-1), jnp.uint8).reshape(-1),
            cnt.astype(jnp.uint8).reshape(-1),
        ])

    def probe(name, fn, x):
        ms = timed_loop(jax.vmap(fn), x, n=args.n, unit=B)
        print(f"{name:34s} {ms * 1e3:8.1f} us/frame")
        return ms

    print(f"-- production post chain (batch {B}, min of 5 x {args.n}-deep) --")
    probe("pallas mask", mask1, low)
    probe("+ keys + compact", compact1, low)
    probe("+ refine (peaks)", peaks1, low)
    probe("pafscore (given peaks)", paf1, low)
    probe("post (all, low->packed)", pack1, low)


if __name__ == "__main__":
    main()
