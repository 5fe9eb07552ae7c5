"""AOT export tool — build / inspect / smoke-run serving bundles.

The TPU-native deployment artifact (no reference analog: rtpose.bin
re-traces the Net at startup, examples/rtpose/rtpose.cpp:173-237): the
fused per-frame program serialized via jax.export + weights + metadata.

  build   build a bundle from (prototxt, caffemodel?) at a fixed config
  check   load a bundle, print its metadata, run one synthetic frame

Run:  python -m caffe_rtpose_tpu export build --caffeproto ... --out bundle/
      python -m caffe_rtpose_tpu export check bundle/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse_resolution(s: str):
    w, h = s.split("x")
    return int(w), int(h)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="export", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("build", help="build a serving bundle")
    e.add_argument("--caffeproto", required=True, help="deploy prototxt")
    e.add_argument("--caffemodel", default="", help=".caffemodel weights "
                   "(omitted: seeded random init — parity/testing bundles)")
    e.add_argument("--out", required=True, help="bundle output directory")
    e.add_argument("--net_resolution", type=_parse_resolution, default=(656, 368))
    e.add_argument("--num_scales", type=int, default=1)
    e.add_argument("--start_scale", type=float, default=1.0)
    e.add_argument("--scale_gap", type=float, default=0.3)
    e.add_argument("--batch", type=int, default=1)
    e.add_argument("--pair_cap", type=int, default=32,
                   help="0 = uncapped (no overflow program needed)")
    e.add_argument("--dtype", default="float32", choices=["bfloat16", "float32"])
    e.add_argument("--input_u8", action="store_true",
                   help="u8 transfer-format input (production pipeline path)")
    e.add_argument("--device_rescale", action="store_true")
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--platforms", default="",
                   help="comma-separated target platforms (e.g. 'tpu' or "
                        "'tpu,cpu'); default: the current backend")

    c = sub.add_parser("check", help="load a bundle and smoke-run it")
    c.add_argument("bundle", help="bundle directory")
    c.add_argument("--frames", type=int, default=1,
                   help="synthetic frames to run (timing: >1 amortizes "
                        "the first-call compile)")
    return p


def cmd_export(args) -> int:
    import jax.numpy as jnp

    from ..pose.estimator import PoseEstimator
    from ..serving import export_estimator

    est = PoseEstimator(
        args.caffeproto,
        weights=args.caffemodel or None,
        net_resolution=tuple(args.net_resolution),
        num_scales=args.num_scales,
        start_scale=args.start_scale,
        scale_gap=args.scale_gap,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        seed=args.seed,
        input_u8=args.input_u8 or args.device_rescale,
        pair_cap=args.pair_cap or None,
        batch=args.batch,
        device_rescale=args.device_rescale,
    )
    platforms = [s for s in args.platforms.split(",") if s] or None
    export_estimator(est, args.out, platforms=platforms)
    sizes = {f: os.path.getsize(os.path.join(args.out, f))
             for f in sorted(os.listdir(args.out))}
    print(f"exported bundle -> {args.out}")
    for f, n in sizes.items():
        print(f"  {f:<24} {n/1e6:.2f} MB")
    return 0


def cmd_check(args) -> int:
    import numpy as np

    from ..serving import ExportedPose

    with open(os.path.join(args.bundle, "meta.json")) as f:
        print(json.dumps(json.load(f), indent=1, sort_keys=True))
    pose = ExportedPose(args.bundle)
    print(f"platforms: {pose.platforms}")
    rs = np.random.RandomState(0)
    frame = (rs.rand(720, 1280, 3) * 255).astype(np.uint8)
    t0 = time.perf_counter()
    for i in range(args.frames):
        result, _ = pose.estimate(frame)
    dt = time.perf_counter() - t0
    print(f"smoke ok: {args.frames} frame(s) in {dt*1e3:.1f} ms, "
          f"num_people={result.num_people}, peaks_sum="
          f"{float(result.peaks[:, 0, 0].sum()):.0f}")
    return 0


def main(argv=None) -> int:
    from ..utils import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    return {"build": cmd_export, "check": cmd_check}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
