"""Per-stage device-time breakdown of the pose CNN via truncated programs.

Builds a chain of programs each ending at a stage-boundary blob (trunk,
stage1, ..., stage6, full fused estimator); XLA dead-code-eliminates
everything past the requested blob, so successive differences give each
stage's true device cost.  Each program is timed dispatch-free with a
20-deep ``lax.fori_loop`` (one dispatch; see measure_device_ms.py for why).

Analytic FLOPs per segment come from the deploy prototxt conv shapes, so
the tool also prints per-stage MFU — the map of where the non-roofline
time goes.

Usage: python scripts/stage_breakdown.py [--batch 8] [--n 20]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"

CUTS = [
    ("conv1_2", ["conv1_2"]),
    ("pool1+conv2_2", ["conv2_2"]),
    ("pool2+conv3_4", ["conv3_4"]),
    ("pool3+conv4_4_CPM", ["conv4_4_CPM"]),
    ("stage1", ["concat_stage2"]),
    ("stage2", ["concat_stage3"]),
    ("stage3", ["concat_stage4"]),
    ("stage4", ["concat_stage5"]),
    ("stage5", ["concat_stage6"]),
    ("stage6", ["concat_stage7"]),
]


def conv_flops_upto(net, blob):
    """Sum 2*MACs of conv layers needed for `blob` (chain nets: all layers
    up to the one producing it).  MACs = output-spatial x weight-elems,
    exact for grouped convs too."""
    total = 0.0
    for impl in net.impls:
        if impl.type == "Convolution":
            n, _, h, w = net.blob_shape(impl.tops[0])
            welems = int(np.prod(net.params[impl.name][0].shape))
            total += 2.0 * n * h * w * welems
        if blob in impl.tops:
            break
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--peak", type=float, default=197e12)
    args = ap.parse_args()
    B, N = args.batch, args.n

    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    est = PoseEstimator(
        COCO_PROTO, net_resolution=(656, 368), num_scales=1,
        dtype=jnp.bfloat16, seed=0, input_u8=True, pair_cap=32, batch=B)
    net = est.net
    params = net.params
    rs = np.random.RandomState(0)
    img = jax.device_put((rs.rand(B, 1, 368, 656, 3) * 255).astype(np.uint8))

    from scripts._timing import timed_loop

    def timed(body):
        return timed_loop(body, img, n=N, unit=B)

    def upto(blob):
        def body(x):
            def one(xi):
                xf = xi.astype(jnp.float32) / 256.0 - 0.5
                blobs = net._apply(params, {"image": xf.astype(net.dtype)},
                                   jax.random.PRNGKey(0), None, False)
                return blobs[blob]
            return jax.vmap(one)(x)
        return body

    rows = []
    prev_ms, prev_fl = 0.0, 0.0
    for name, blobs in CUTS:
        ms = timed(upto(blobs[0]))
        fl = conv_flops_upto(net, blobs[0])  # blob shapes are per-frame (n=1)
        seg_ms, seg_fl = ms - prev_ms, fl - prev_fl
        mfu = seg_fl / (seg_ms * 1e-3) / args.peak if seg_ms > 0 else float("nan")
        rows.append((name, ms, seg_ms, seg_fl / 1e9, mfu))
        prev_ms, prev_fl = ms, fl

    # full fused program (postprocessing)
    nms_thr = jnp.float32(est.params_connect.nms_threshold)
    inter_thr = jnp.float32(est.params_connect.inter_threshold)
    fwd = est._raw_fn
    full_ms = timed(lambda x: fwd(params, x, nms_thr, inter_thr))
    rows.append(("post(ImResize+NMS+PAF+pack)", full_ms, full_ms - prev_ms,
                 0.0, float("nan")))

    print(f"{'segment':<28}{'cum ms':>8}{'seg ms':>8}{'GFLOP':>8}{'MFU %':>7}")
    for name, cum, seg, gf, mfu in rows:
        m = f"{mfu*100:5.1f}" if mfu == mfu else "    -"
        print(f"{name:<28}{cum:8.3f}{seg:8.3f}{gf:8.1f}{m:>7}")


if __name__ == "__main__":
    main()
