"""Dev bench: 3-scale quality mode FPS (VERDICT r2 weak #3 / next #6).

Measures the reference quality config (--num_scales 3 --scale_gap 0.15,
656x368) through the production pipeline with the scale-sublinear packed
u8 upload (default for multi-scale) vs the full-canvas format.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

COCO_PROTO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


def main():
    import jax.numpy as jnp

    from bench import synthetic_source
    from caffe_rtpose_tpu.pipeline.runner import PipelineConfig, RtPosePipeline
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    rs = np.random.RandomState(0)
    frames = [(rs.rand(720, 1280, 3) * 255).astype(np.uint8) for _ in range(4)]

    ests = {}
    configs = ["canvases", "packed", "device_rescale"]
    for name in configs:
        ests[name] = PoseEstimator(
            COCO_PROTO, net_resolution=(656, 368), num_scales=3,
            start_scale=1.0, scale_gap=0.15, dtype=jnp.bfloat16, seed=0,
            input_u8=True, pair_cap=32, batch=8,
            pack_u8=name == "packed",
            device_rescale=name == "device_rescale")
        print(f"{name}: upload {np.prod(ests[name].input_shape())/1e3:.0f} KB/frame",
              flush=True)

    def one(name, n=96):
        cfg = PipelineConfig(
            resolution=(1280, 720), net_resolution=(656, 368), num_scales=3,
            start_scale=1.0, scale_gap=0.15,
            no_frame_drops=True, no_display=True, frame_limit=n,
            fetchers=6, dispatchers=2, queue_depth=8)
        pipe = RtPosePipeline(ests[name], cfg)
        pipe.frame_iter = synthetic_source(frames, n)
        pipe.run()
        return round(pipe.fps, 2)

    for name in configs:  # compile warmup
        one(name, n=16)
    results = {name: [] for name in configs}
    for rep in range(3):
        for name in configs:
            f = one(name)
            results[name].append(f)
            print(json.dumps({"config": name, "fps": f, "rep": rep}), flush=True)
            time.sleep(2)
    print(json.dumps({
        "metric": "pose_fps_656x368_3scale",
        **{f"{name}_best": max(results[name]) for name in configs},
        "all": results,
    }), flush=True)


if __name__ == "__main__":
    main()
