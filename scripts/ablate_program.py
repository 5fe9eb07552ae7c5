"""Stage-ablation timing of the fused pose program: compile truncated
variants (CNN-only -> +upsample -> +peaks -> full) and diff their times.
The jax profiler trace hangs over the axon tunnel, so this is the
ground-truth breakdown tool for VERDICT #7 (MFU push).

Usage: python scripts/ablate_program.py [--batch 8]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


def timeit(fn, args, iters=20, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)

    def run_n(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32))))
        return (time.perf_counter() - t0) / n

    run_n(3)
    return min(run_n(iters) for _ in range(reps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    B = args.batch

    from caffe_rtpose_tpu.ops.imresize import imresize_average
    from caffe_rtpose_tpu.ops.nms import refined_peaks_lowres
    from caffe_rtpose_tpu.pose import connect as C
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    est = PoseEstimator(
        COCO_PROTO, net_resolution=(656, 368), num_scales=1,
        dtype=jnp.bfloat16, seed=0, input_u8=True, pair_cap=32, batch=B)
    net = est.net
    impls = net.prune_for([est.lowres_blob])
    low_info = net.blob_infos[est.lowres_blob]
    h, w = low_info.shape_physical[1], low_info.shape_physical[2]
    th, tw = 8 * h, 8 * w
    P, MP, eff = est.num_parts, est.max_peaks, est.eff_peaks
    desc, ss, sg = est.descriptor, est.start_scale, est.scale_gap

    rs = np.random.RandomState(0)
    x = jax.device_put((rs.rand(B, 1, 368, 656, 3) * 255).astype(np.uint8))
    nms_thr = jnp.float32(est.params_connect.nms_threshold)
    inter_thr = jnp.float32(est.params_connect.inter_threshold)

    def normalize(img):
        return (img.astype(jnp.float32) / 256.0 - 0.5).astype(net.dtype)

    def cnn_only(params, img):
        blobs = net._apply(params, {"image": normalize(img)},
                           jax.random.PRNGKey(0), None, False, impls=impls)
        return blobs[est.lowres_blob]

    def plus_upsample(params, img):
        low = cnn_only(params, img)
        return imresize_average(low[..., :P], th, tw, ss, sg)

    def plus_peaks(params, img, thr):
        low = cnn_only(params, img)
        resized = imresize_average(low[..., :P], th, tw, ss, sg)
        heat = jnp.transpose(resized[0], (2, 0, 1))
        return refined_peaks_lowres(low[..., : P + 1], heat, thr, MP, ss, sg)

    def full(params, img, thr, ithr):
        low = cnn_only(params, img)
        resized = imresize_average(low[..., :P], th, tw, ss, sg)
        heat = jnp.transpose(resized[0], (2, 0, 1))
        peaks = refined_peaks_lowres(low[..., : P + 1], heat, thr, MP, ss, sg)
        peaks = peaks[:, : eff + 1]
        return C.score_pairs_lowres(low, peaks, desc, (th, tw), ss, sg, ithr)

    stages = [
        ("cnn_only      ", jax.jit(jax.vmap(cnn_only, (None, 0))),
         (net.params, x)),
        ("+part_upsample", jax.jit(jax.vmap(plus_upsample, (None, 0))),
         (net.params, x)),
        ("+nms_peaks    ", jax.jit(jax.vmap(plus_peaks, (None, 0, None))),
         (net.params, x, nms_thr)),
        ("+pair_scores  ", jax.jit(jax.vmap(full, (None, 0, None, None))),
         (net.params, x, nms_thr, inter_thr)),
    ]
    prev = 0.0
    for name, fn, fargs in stages:
        t = timeit(fn, fargs) / B * 1e3
        print(f"{name}: {t:7.3f} ms/frame  (+{t - prev:6.3f})")
        prev = t


if __name__ == "__main__":
    main()
