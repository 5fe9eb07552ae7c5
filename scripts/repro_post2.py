"""Sub-step attribution inside the post segment (follow-up to repro_post.py).

repro_post.py measured nms-given-heat at ~750 us/frame against a ~64 us
HBM floor; this probe splits refined_peaks_lowres into its stages to find
where the time goes:

  mask       — find_peaks_mask on the (P, th, tw) f32 heat (separable stencil)
  keys       — + block_keys (pair-collapse to position keys)
  compact    — + compact_keys (sort-free rank search)
  refine     — full refined_peaks_lowres (adds the low-res window matmuls)
  ups+mask   — imresize + transpose + stencil fused (heat never fetched)

Each stage returns its full output so the timing harness's carry reduce
cannot dead-code-eliminate it (scripts/_timing.py).
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

    from caffe_rtpose_tpu.pose.estimator import PoseEstimator
    from caffe_rtpose_tpu.ops.imresize import imresize_average
    from caffe_rtpose_tpu.ops import nms as N

    est = PoseEstimator(
        COCO_PROTO, net_resolution=(656, 368), num_scales=1,
        dtype=jnp.bfloat16, seed=0, input_u8=True, pair_cap=32, batch=B)
    net = est.net
    P, M = est.num_parts, est.max_peaks
    th, tw = est.net_h, est.net_w
    ss, sg = est.start_scale, est.scale_gap
    thr = jnp.float32(est.params_connect.nms_threshold)
    info = net.blob_infos[est.lowres_blob]
    S, h, w, Ct = info.shape_physical

    rs = np.random.RandomState(0)
    impls = net.prune_for([est.lowres_blob])
    x_u8 = jnp.asarray((rs.rand(B, S, th, tw, 3) * 255).astype(np.uint8))

    def cnn1(img):
        xf = img.astype(jnp.float32) / 256.0 - 0.5
        blobs = net._apply(net.params, {"image": xf.astype(net.dtype)},
                           jax.random.PRNGKey(0), None, False, impls=impls)
        return blobs[est.lowres_blob]

    low = jax.jit(jax.vmap(cnn1))(x_u8)
    low = jax.device_put(np.asarray(jax.device_get(low)))

    def heat1(lo):
        return jnp.transpose(
            imresize_average(lo[..., :P], th, tw, ss, sg)[0], (2, 0, 1))

    heat = jax.device_put(np.asarray(jax.device_get(
        jax.jit(jax.vmap(heat1))(low))))

    def probe(name, fn, x):
        ms = timed_loop(jax.vmap(fn), x, n=args.n, unit=B)
        print(f"{name:34s} {ms * 1e3:8.1f} us/frame")
        return ms

    print(f"-- nms sub-steps (batch {B}, min of 5 x {args.n}-deep) --")
    probe("mask (stencil only)", lambda he: N.find_peaks_mask(he, thr), heat)
    probe("mask+keys", lambda he: N.block_keys(
        N.find_peaks_mask(he, thr), th, tw), heat)

    def to_compact(he):
        kb = N.block_keys(N.find_peaks_mask(he, thr), th, tw)
        return N.compact_keys(kb.reshape(P, -1), th * tw, M)

    probe("mask+keys+compact", to_compact, heat)
    probe("refined_peaks_lowres (full)",
          lambda lo: N.refined_peaks_lowres(lo[..., : P + 1], heat[0], thr,
                                            M, ss, sg), low)

    def upsmask(lo):
        return N.find_peaks_mask(heat1(lo), thr)

    probe("ups+transpose+mask fused", upsmask, low)

    # stencil layout experiment: NHWC (th, tw, P) instead of (P, th, tw)
    heat_hwc = jax.device_put(np.ascontiguousarray(
        np.moveaxis(np.asarray(jax.device_get(heat)), 1, 3)))

    def mask_hwc(he):
        hf = he.astype(jnp.float32)
        ctr = hf[1:-1, 1:-1, :]
        row3 = jnp.maximum(jnp.maximum(hf[:, :-2, :], hf[:, 1:-1, :]), hf[:, 2:, :])
        vert = jnp.maximum(row3[:-2, :, :], row3[2:, :, :])
        horz = jnp.maximum(hf[1:-1, :-2, :], hf[1:-1, 2:, :])
        mask = (ctr > thr) & (ctr > jnp.maximum(vert, horz))
        return jnp.pad(mask, ((1, 1), (1, 1), (0, 0)))

    probe("mask NHWC layout (experiment)", mask_hwc, heat_hwc)


if __name__ == "__main__":
    main()
