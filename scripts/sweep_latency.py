"""Dev sweep: latency-mode p50/p95 vs batch size (real TPU).

Interleaves configs across repeats so tunnel swings hit all configs
equally.  Not part of bench.py — results inform its latency_pass config.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


def main():
    import jax.numpy as jnp

    from bench import paced_source
    from caffe_rtpose_tpu.pipeline.runner import PipelineConfig, RtPosePipeline
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    rs = np.random.RandomState(0)
    frames = [(rs.rand(720, 1280, 3) * 255).astype(np.uint8) for _ in range(4)]

    configs = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["1", "2", "4"])]
    ests = {}
    for b in configs:
        ests[b] = PoseEstimator(
            COCO_PROTO, net_resolution=(656, 368), num_scales=1,
            dtype=jnp.bfloat16, seed=0, input_u8=True, pair_cap=32, batch=b)

    def one(b, n=180):
        cfg = PipelineConfig(
            resolution=(1280, 720), net_resolution=(656, 368), num_scales=1,
            no_frame_drops=False, no_display=True, frame_limit=n,
            fetchers=2, dispatchers=2, queue_depth=1,
            batch_wait_ms=40.0 if b > 1 else None)
        pipe = RtPosePipeline(ests[b], cfg)
        pipe.frame_iter = paced_source(frames, n, 30.0)
        pipe.run()
        lat = np.array([s["e2e"] for s in pipe.stats]) * 1e3
        return {
            "batch": b, "fps": round(pipe.fps, 2),
            "drop": round(pipe.dropped / float(n), 3),
            "p50": round(float(np.percentile(lat, 50)), 1),
            "p95": round(float(np.percentile(lat, 95)), 1),
        }

    for b in configs:  # warmup compiles
        one(b, n=24)
    results = []
    for rep in range(3):
        for b in configs:
            r = one(b)
            r["rep"] = rep
            results.append(r)
            print(json.dumps(r), flush=True)
            time.sleep(2)
    by_b = {}
    for r in results:
        by_b.setdefault(r["batch"], []).append(r)
    for b, rows in by_b.items():
        print(json.dumps({
            "batch": b,
            "med_p50": float(np.median([r["p50"] for r in rows])),
            "med_p95": float(np.median([r["p95"] for r in rows])),
            "med_fps": float(np.median([r["fps"] for r in rows])),
            "med_drop": float(np.median([r["drop"] for r in rows])),
        }), flush=True)


if __name__ == "__main__":
    main()
