"""Standalone repro attributing the post-segment cost (VERDICT r4 #4).

The per-segment breakdown (scripts/stage_breakdown.py) prices every CNN
block with GFLOP + MFU but left the `post (ImResize+NMS+PAF+pack)` row
unattributed at ~0.49 ms/frame.  This script isolates each post step at
the production config (COCO deploy, 656x368, 1 scale, bf16, batch 8,
pair_cap 32) and times it dispatch-free (scripts/_timing.py), alongside a
bytes-moved + FLOP roofline for each:

  * upsample   — imresize_average: the 18 part channels, bicubic-as-matmul
                 (46x82 -> 368x656); FLOP-light but writes a 17.4 MB f32
                 heat map per frame;
  * nms        — refined_peaks_lowres given the heat map: separable strict
                 8-neighbor stencil, 2x2 block-max key reduce, one top_k,
                 7x7 centroid refinement recomputed from low-res;
  * ups+nms    — the two fused from `low` (what the production program
                 does; XLA fuses the stencil into the upsample epilogue);
  * pairs      — score_pairs_lowres: PAF line-integral scoring of all limb
                 candidates as one batched einsum over low-res maps;
  * pack       — bitcast + concat of peaks | f16 scores | u8 counts;
  * post-all   — low -> packed, everything fused;
  * cnn / full — truncated-program cross-check: full fused program minus
                 CNN-to-lowres must land near post-all.

Reference scope being priced: resize+nms layers + the host line integral
(/root/reference/src/rtpose/imresize_layer.cu, nms_layer.cu,
examples/rtpose/rtpose.cpp:666-778 connectLimbsCOCO inner loops).

Findings land in docs/performance.md ("post segment floor").
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import timed_loop

COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"
PEAK = 197e12  # v5e bf16 FLOP/s
HBM = 819e9   # v5e HBM bytes/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()
    B = args.batch

    from caffe_rtpose_tpu.pose.estimator import PoseEstimator
    from caffe_rtpose_tpu.pose import connect as C
    from caffe_rtpose_tpu.ops.imresize import imresize_average
    from caffe_rtpose_tpu.ops.nms import refined_peaks_lowres

    est = PoseEstimator(
        COCO_PROTO, net_resolution=(656, 368), num_scales=1,
        dtype=jnp.bfloat16, seed=0, input_u8=True, pair_cap=32, batch=B)
    net = est.net
    desc = est.descriptor
    P, M, eff = est.num_parts, est.max_peaks, est.eff_peaks
    L = desc.num_limbs
    info = net.blob_infos[est.lowres_blob]
    S, h, w, Ct = info.shape_physical
    th, tw = est.net_h, est.net_w
    ss, sg = est.start_scale, est.scale_gap
    thr = jnp.float32(est.params_connect.nms_threshold)
    ithr = jnp.float32(est.params_connect.inter_threshold)
    print(f"low-res maps ({S},{h},{w},{Ct}) -> heat ({P},{th},{tw}); "
          f"max_peaks={M} pair_cap={eff} limbs={L} batch={B}")

    rs = np.random.RandomState(0)
    # realistic low maps: run the truncated CNN once on random frames so
    # peak counts / refinement gathers see production-like data
    impls = net.prune_for([est.lowres_blob])
    x_u8 = jnp.asarray((rs.rand(B, S, th, tw, 3) * 255).astype(np.uint8))

    def cnn1(img):
        xf = img.astype(jnp.float32) / 256.0 - 0.5
        blobs = net._apply(net.params, {"image": xf.astype(net.dtype)},
                           jax.random.PRNGKey(0), None, False, impls=impls)
        return blobs[est.lowres_blob]

    cnn = jax.vmap(cnn1, in_axes=0)
    low = jax.jit(cnn)(x_u8)
    low = jax.device_put(np.asarray(jax.device_get(low)))  # sever the graph

    def ups1(lo):
        return imresize_average(lo[..., :P], th, tw, ss, sg)

    def heat1(lo):
        return jnp.transpose(ups1(lo)[0], (2, 0, 1))  # (P, th, tw) f32

    heat = jax.device_put(np.asarray(jax.device_get(
        jax.jit(jax.vmap(heat1))(low))))

    def nms1(lo, he):
        return refined_peaks_lowres(lo[..., : P + 1], he, thr, M, ss, sg)

    def upsnms1(lo):
        return nms1(lo, heat1(lo))[:, : eff + 1]

    peaks = jax.device_put(np.asarray(jax.device_get(
        jax.jit(jax.vmap(upsnms1))(low))))

    def pairs1(lo, pk):
        return C.score_pairs_lowres(lo, pk, desc, (th, tw), ss, sg, ithr)

    def pack1(pk, sc, ct):
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(pk.reshape(-1), jnp.uint8).reshape(-1),
            jax.lax.bitcast_convert_type(
                sc.astype(jnp.float16).reshape(-1), jnp.uint8).reshape(-1),
            ct.astype(jnp.uint8).reshape(-1),
        ])

    sc, ct = jax.jit(jax.vmap(pairs1, in_axes=(0, 0)))(low, peaks)
    sc = jax.device_put(np.asarray(jax.device_get(sc)))
    ct = jax.device_put(np.asarray(jax.device_get(ct)))

    def post1(lo):
        he = heat1(lo)
        pk = nms1(lo, he)[:, : eff + 1]
        s, c = pairs1(lo, pk)
        return pack1(pk, s, c)

    # analytic roofline inputs (per frame)
    gf_ups = 2.0 * P * S * (th * h * w + th * w * tw) / 1e9
    by_ups = (h * w * Ct * 2 + th * tw * P * 4)            # read low, write heat
    by_nms = th * tw * P * 4 * 3                           # ~3 stencil passes
    # pairs: per limb, eff*eff candidates x 10 samples x 2 channels, each a
    # (h + w)-tap separable sample -> einsum FLOPs
    gf_pairs = 2.0 * L * eff * eff * 10 * 2 * (h + w) / 1e9
    by_pack = P * (eff + 1) * 3 * 4 + L * eff * eff * 3

    rows = []

    def probe(name, fn, x, gf=None, bytes_=None):
        ms = timed_loop(jax.vmap(fn), x, n=args.n, unit=B)
        rows.append((name, ms, gf, bytes_))
        mfu = f"{gf / (ms * 1e-3) / (PEAK / 1e9) * 100:5.1f}%" if gf else "  —  "
        bw = (f"{bytes_ / (ms * 1e-3) / HBM * 100:5.1f}%" if bytes_ else "  —  ")
        floor = max((gf or 0) * 1e9 / PEAK, (bytes_ or 0) / HBM) * 1e6
        print(f"{name:28s} {ms * 1e3:8.1f} us/frame   MFU {mfu}  "
              f"HBM {bw}  roofline-floor {floor:6.1f} us")
        return ms

    print(f"\n-- standalone post steps (batch {B}, dispatch-free, "
          f"min of 5 x {args.n}-deep loops) --")
    t_ups = probe("upsample (imresize 18ch)", ups1, low, gf_ups, by_ups)
    probe("nms (given heat)", lambda he: nms1(low[0], he), heat,
          None, by_nms)
    t_upsnms = probe("upsample+nms fused", upsnms1, low, gf_ups,
                     by_ups + by_nms)
    probe("paf pairs (given peaks)", lambda lo: pairs1(lo, peaks[0]), low,
          gf_pairs, None)
    probe("pack (bitcast+concat)", lambda pk: pack1(pk, sc[0], ct[0]), peaks,
          None, by_pack)
    t_post = probe("post-all (low -> packed)", post1, low,
                   gf_ups + gf_pairs, by_ups + by_nms + by_pack)

    print("\n-- truncated-program cross-check --")
    t_cnn = timed_loop(cnn, x_u8, n=args.n, unit=B)
    body = est._raw_fn
    t_full = timed_loop(lambda x: body(net.params, x, thr, ithr), x_u8,
                        n=args.n, unit=B)
    print(f"{'cnn -> lowres':28s} {t_cnn:8.3f} ms/frame")
    print(f"{'full fused program':28s} {t_full:8.3f} ms/frame")
    print(f"{'full - cnn (post by diff)':28s} {t_full - t_cnn:8.3f} ms/frame "
          f"(standalone post-all: {t_post:.3f})")


if __name__ == "__main__":
    main()
