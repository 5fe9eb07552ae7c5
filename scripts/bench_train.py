"""End-to-end CPM training throughput on one chip, by pipeline shape.

Reproduces docs/performance.md's training table measurement and adds the
device-staged prefetch ring: u8 augmented images + joint coordinates ship
to device, labels rasterize on device (training.labels_device), losses are
the full 6-stage dual-branch weighted EuclideanLoss graph.

Shapes measured (same math, identical losses):
  sync     — no prefetch: augmentation and upload inside the step loop
  ring     — 3-deep host prefetch ring (aug overlaps the step; upload
             still synchronous in Solver.step)
  staged   — 3-deep device-staging ring (datasets.stage_batches): aug AND
             upload overlap the step

Usage: python scripts/bench_train.py [--batch 10] [--iters 20]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--crop", type=int, default=368)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--shapes", default="sync,ring,staged")
    args = ap.parse_args()
    B = args.batch

    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.models.cpm import make_pose_train_net
    from caffe_rtpose_tpu.training.datasets import (
        SyntheticPoseSource, prefetch_loader, stage_batches)
    from caffe_rtpose_tpu.training.labels_device import (
        make_input_transform, pose_batches_jointfeed)
    from caffe_rtpose_tpu.training.solver import Solver
    from caffe_rtpose_tpu.training.transformer import AugParams

    prm = AugParams(crop_size_x=args.crop, crop_size_y=args.crop, stride=8)
    source = SyntheticPoseSource(n=64, size=args.crop, seed=0)

    def run(shape: str) -> float:
        net = Net(make_pose_train_net(batch=B, crop=args.crop),
                  phase="TRAIN", seed=0)
        batches = pose_batches_jointfeed(source, prm, B, seed=1, data_u8=True)
        if shape == "ring":
            batches = prefetch_loader(batches)
        elif shape == "staged":
            batches = stage_batches(batches, net)
        it = iter(batches)
        solver = Solver(
            "base_lr: 2e-5 lr_policy: 'fixed' momentum: 0.9 "
            "weight_decay: 5e-4",
            net, lambda _: next(it),
            input_transform=make_input_transform(prm, data_u8=True))
        solver.step(2)  # compile + ring fill
        t0 = time.perf_counter()
        solver.step(args.iters)
        dt = time.perf_counter() - t0
        return args.iters / dt

    for shape in args.shapes.split(","):
        ips = run(shape)
        print(f"{shape:<8} {ips:5.2f} iters/s  {ips * B:6.1f} imgs/s")


if __name__ == "__main__":
    main()
