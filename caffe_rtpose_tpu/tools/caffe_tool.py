"""caffe CLI equivalent: train / test / time / device_query brew commands
(reference tools/caffe.cpp:180-422).

    python -m caffe_rtpose_tpu.tools.caffe_tool train --solver solver.prototxt \
        --data batches.h5 [--snapshot snap_iter_100.solverstate | --weights w.caffemodel]
    python -m caffe_rtpose_tpu.tools.caffe_tool test --model net.prototxt \
        --weights w.caffemodel --data batches.h5 --iterations 50
    python -m caffe_rtpose_tpu.tools.caffe_tool time --model net.prototxt --iterations 10
    python -m caffe_rtpose_tpu.tools.caffe_tool device_query

Data sources (replacing in-graph LMDB data layers): ``--data`` accepts an
.h5/.npz file whose keys match the net's input blob names, or
``synthetic-pose`` for the CPM transformer stream.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, Iterator

import numpy as np


def make_data_iter(spec: str, net, batch_hint: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    if getattr(net, "data_layers", None) and spec in ("net", "synthetic-pose"):
        # the prototxt carries its own data layers (Data/ImageData/HDF5Data/
        # ...): pull prefetched batches from the bound host sources, exactly
        # like `caffe train` with an in-graph data layer
        def it_net():
            while True:
                out: Dict[str, np.ndarray] = {}
                for dl in net.data_layers:
                    out.update(dl.next_batch())
                yield out

        return it_net()
    if not net.input_names:
        # every top is produced in-graph (DummyData and friends): the net
        # feeds itself, like the reference's layer-driven data path
        return iter(lambda: {}, None)
    if spec == "synthetic-pose":
        from ..training.datasets import SyntheticPoseSource, pose_batches, prefetch_loader
        from ..training.transformer import AugParams

        batch = net.blob_infos[net.input_names[0]].shape_caffe[0]
        return prefetch_loader(pose_batches(SyntheticPoseSource(), AugParams(), batch))
    if spec.startswith(("cpm-lmdb:", "pose-db:")):
        # train straight from a reference genLMDB-format DB (binary Datum
        # records, training/cpm_lmdb.py) or from our own pose kvdb
        from ..training.datasets import pose_batches, prefetch_loader
        from ..training.transformer import AugParams

        kind, path = spec.split(":", 1)
        if kind == "cpm-lmdb":
            from ..training.cpm_lmdb import CpmDatumSource
            source = CpmDatumSource(path)
        else:
            from ..training.pose_db import PoseDbSource
            source = PoseDbSource(path)
        batch = net.blob_infos[net.input_names[0]].shape_caffe[0]
        return prefetch_loader(pose_batches(source, AugParams(), batch))
    if spec.endswith(".npz"):
        arrs = dict(np.load(spec))

        def it():
            while True:
                yield {k: arrs[k] for k in net.input_names}

        return it()
    if spec.endswith((".h5", ".hdf5")):
        import h5py

        f = h5py.File(spec, "r")
        n = f[net.input_names[0]].shape[0]
        batch = net.blob_infos[net.input_names[0]].shape_caffe[0]

        def it():
            i = 0
            while True:
                # bulk contiguous slice + wrap remainder: cyclic order and a
                # full batch, without h5py's sorted-unique fancy indexing
                head = min(batch, n - i)
                yield {
                    k: (np.asarray(f[k][i : i + batch]) if head == batch
                        else np.concatenate([np.asarray(f[k][i:n]),
                                             np.asarray(f[k][: batch - head])]))
                    for k in net.input_names
                }
                i = (i + batch) % n

        return it()
    raise ValueError(f"unsupported data source {spec!r}")


def _netstate_kw(args, force_level=True):
    """--level/--stage (tools/caffe.cpp:39-43): NetState filtering knobs
    forwarded into Net's FilterNet rules.

    ``force_level=True`` mirrors the Net(file, phase, level) constructor
    used by `caffe test`/`time`: the flag's value (default 0) always
    overrides a prototxt-declared state.level (net.cpp:44 unconditionally
    set_level).  The train path passes False — solver.cpp:99-103 MergeFrom
    lets the file's level survive unless train_state/the flag set one."""
    kw = {}
    if force_level:
        kw["level"] = int(getattr(args, "level", 0))
    elif getattr(args, "level", 0):
        kw["level"] = int(args.level)
    if getattr(args, "stage", ""):
        kw["stages"] = [s for s in args.stage.split(",") if s]
    return kw


def cmd_train(args) -> int:
    from ..core.net import Net
    from ..proto import caffe_pb, prototxt
    from ..training.solver import Solver, learning_rate
    from ..utils.signals import SignalHandler, SolverAction, parse_action

    sp_msg = prototxt.parse_file(args.solver, "SolverParameter")
    sp = caffe_pb.view(sp_msg, "SolverParameter")
    net_path = sp.net if sp.has("net") else sp.train_net
    if sp.has("net_param") or sp.has("train_net_param"):
        net_param = sp_msg.get("net_param") or sp_msg.get("train_net_param")
    else:
        net_param = net_path
    # SolverParameter.train_state merges over the net's own state with the
    # CLI flags last (solver.cpp:99-103 MergeFrom precedence)
    kw = _netstate_kw(args, force_level=False)
    ts = sp_msg.get("train_state")
    if ts:
        kw["stages"] = list(ts.get("stage", [])) + list(kw.get("stages", []))
        if "level" not in kw and ts.get("level"):
            kw["level"] = int(ts["level"])
    net = Net(net_param, phase="TRAIN", seed=int(sp.random_seed) if sp.random_seed > 0 else 0,
              **kw)

    mesh = None
    if getattr(args, "gpu", ""):
        # `caffe train --gpu=0,1,...|all` (tools/caffe.cpp:76-107,247-253):
        # data-parallel over the named devices, replacing P2PSync
        import jax

        from ..parallel.dp import make_mesh

        n = len(jax.devices()) if args.gpu == "all" else len(args.gpu.split(","))
        spatial = int(getattr(args, "spatial", 1) or 1)
        if n > 1 and spatial > 1:
            from ..parallel.mesh2d import make_mesh2d

            mesh = make_mesh2d(n, spatial=spatial)
            print(f"Composed mesh training over {n} devices: "
                  f"{n // spatial}-way data x {spatial}-way spatial "
                  f"(batch sharded AND activations H-sharded)")
        elif n > 1:
            mesh = make_mesh(n)
            print(f"Data-parallel training over {n} devices; the prototxt "
                  f"batch_size is the GLOBAL batch, sharded {n} ways "
                  f"(scale it by {n} for Caffe's per-GPU weak-scaling)")
        elif spatial > 1:
            print(f"warning: --spatial {spatial} ignored — it needs a "
                  f"multi-device mesh, but --gpu resolved to {n} device(s); "
                  f"training single-device", flush=True)
    elif int(getattr(args, "spatial", 1) or 1) > 1:
        print(f"warning: --spatial {args.spatial} ignored — spatial "
              f"sharding composes with data parallelism; pass --gpu "
              f"all (or a device list) to build the mesh", flush=True)

    # test nets from the solver param (test_net files / the shared net at
    # TEST phase, with per-net test_iter — tools/caffe.cpp + Solver::Init)
    test_nets = []
    if sp.has("test_interval") and int(sp.test_interval) > 0:
        iters = [int(v) for v in sp.test_iter] or [50]
        sources = list(sp.test_net) or ([net_param] if not sp.has("test_net") else [])
        test_states = list(sp_msg.get("test_state", []))
        for i, src in enumerate(sources):
            tkw = {}
            if i < len(test_states):
                tst = test_states[i]
                if tst.get("stage"):
                    tkw["stages"] = list(tst["stage"])
                if tst.get("level"):
                    tkw["level"] = int(tst["level"])
            tnet = Net(src, phase="TEST", **tkw)
            ti = iters[min(i, len(iters) - 1)]
            fn = None
            if not tnet.data_layers:
                try:
                    t_iter_data = make_data_iter(args.data, tnet)
                except ValueError:
                    print(f"warning: test net #{i} skipped — no usable data "
                          f"source for {args.data!r}", file=sys.stderr)
                    continue
                fn = lambda it, _d=t_iter_data: next(_d)
            test_nets.append((tnet, fn, ti))

    input_transform = None
    if getattr(args, "fused_labels", False):
        # fast pose-training pipeline: u8 image upload + on-device CPM label
        # rasterization + prefetch (measured ~2.2x step rate at batch 10,
        # docs/performance.md); requires a CPM train graph with data+label
        # inputs and the synthetic/JSON pose sources
        from ..training.datasets import SyntheticPoseSource, prefetch_loader
        from ..training.labels_device import (make_input_transform,
                                              pose_batches_jointfeed)
        from ..training.transformer import AugParams

        shp = net.blob_infos["data"].shape_caffe
        prm = AugParams(crop_size_x=shp[3], crop_size_y=shp[2])
        if args.data == "synthetic-pose":
            src = SyntheticPoseSource(size=max(shp[2], shp[3]) + 52)
        else:
            from ..training.datasets import JsonPoseSource

            src = JsonPoseSource(args.data)
        data_iter = prefetch_loader(pose_batches_jointfeed(
            src, prm, batch_size=shp[0], data_u8=True))
        input_transform = make_input_transform(prm, data_u8=True)
    else:
        data_iter = make_data_iter(args.data, net)
    solver = Solver(sp_msg, net, lambda it: next(data_iter), mesh=mesh,
                    input_transform=input_transform, test_nets=test_nets)
    if args.snapshot:
        solver.restore(args.snapshot)
        print(f"Restored from {args.snapshot} at iter {solver.it}")
    elif args.weights:
        n = net.load_weights(args.weights)
        print(f"Finetuning from {args.weights} ({n} layers copied)")

    handler = SignalHandler(parse_action(args.sigint_effect), parse_action(args.sighup_effect))
    max_iter = int(sp.max_iter) if sp.has("max_iter") else args.iterations
    display = int(sp.display) if sp.has("display") else 20
    import time as _time

    t_disp = _time.time()
    it_disp = solver.it
    try:
        while solver.it < max_iter:
            loss = solver.step(1)
            if display and solver.it % display == 0:
                # rate prefix like solver.cpp:237-243's
                # "Iteration N (R iter/s, Ts/D iters)"
                dt = max(_time.time() - t_disp, 1e-9)
                di = solver.it - it_disp
                t_disp, it_disp = _time.time(), solver.it
                print(f"Iteration {solver.it} ({di / dt:.4g} iter/s, "
                      f"{dt:.4g}s/{di} iters), loss = {loss:.6f} "
                      f"(smoothed {solver.smoothed_loss:.6f})")
                # solver.cpp:250-261 / sgd_solver.cpp:GetLearningRate
                solver.display_outputs()
                print(f"Iteration {solver.it}, "
                      f"lr = {learning_rate(solver.sp, solver.it):g}")
            action = handler.check_for_action()
            if action == SolverAction.SNAPSHOT:
                paths = solver.snapshot(args.snapshot_prefix or sp.snapshot_prefix or "snapshot")
                print(f"Snapshotted to {paths[0]}")
            elif action == SolverAction.STOP:
                print("Optimization stopped early.")
                break
    finally:
        handler.restore()
    if sp.snapshot_after_train and (sp.snapshot_prefix or args.snapshot_prefix):
        solver.snapshot(args.snapshot_prefix or sp.snapshot_prefix)
    print(f"Optimization Done. Final loss {solver.smoothed_loss:.6f}")
    return 0


def cmd_test(args) -> int:
    from ..core.net import Net

    net = Net(args.model, phase="TEST", **_netstate_kw(args))
    if args.weights:
        net.load_weights(args.weights)
    data_iter = make_data_iter(args.data, net)
    totals: Dict[str, float] = {}
    for i in range(args.iterations):
        batch = next(data_iter)
        out = net.forward(batch)
        for k, v in out.items():
            totals[k] = totals.get(k, 0.0) + float(np.mean(v))
    for k, v in totals.items():
        print(f"{k} = {v / args.iterations:.6f}")
    return 0


def cmd_time(args) -> int:
    from ..core.net import Net
    from ..utils.profiler import print_timing, time_net

    net = Net(args.model, phase="TRAIN" if args.phase == "TRAIN" else "TEST",
              **_netstate_kw(args))
    rs = np.random.RandomState(0)
    inputs = {
        name: rs.rand(*net.blob_infos[name].shape_caffe).astype(np.float32)
        for name in net.input_names
    }
    if getattr(args, "trace_dir", ""):
        # XLA-level tracing (the jax profiler is the TPU-native counterpart
        # to `caffe time`'s cudaEvent breakdown; view with tensorboard or
        # xprof)
        import jax

        with jax.profiler.trace(args.trace_dir):
            results = time_net(net, inputs, iterations=args.iterations,
                               backward=args.phase == "TRAIN")
        print(f"Profiler trace written to {args.trace_dir}")
    else:
        results = time_net(net, inputs, iterations=args.iterations,
                           backward=args.phase == "TRAIN")
    print_timing(results)
    return 0


def cmd_device_query(args) -> int:
    import jax

    for d in jax.devices():
        print(f"Device id: {d.id}")
        print(f"  platform: {d.platform}")
        print(f"  device_kind: {d.device_kind}")
        try:
            stats = d.memory_stats() or {}
            if "bytes_limit" in stats:
                print(f"  memory: {stats.get('bytes_in_use', 0)}/{stats['bytes_limit']} bytes")
        except Exception:
            pass
    return 0


def build_parser():
    p = argparse.ArgumentParser(prog="caffe", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train")
    t.add_argument("--solver", required=True)
    t.add_argument("--gpu", default="", help="'all' or comma-separated device ids: data-parallel over a mesh")
    t.add_argument("--spatial", type=int, default=1,
                   help="with --gpu: also H-shard activations this many "
                        "ways (composed data x spatial mesh, mesh2d.py); "
                        "device count must be divisible by it")
    t.add_argument("--fused_labels", action="store_true",
                   help="pose training fast path: u8 upload + device label rasterization + prefetch")
    t.add_argument("--data", default="synthetic-pose")
    t.add_argument("--snapshot", default="", help="resume from .solverstate")
    t.add_argument("--weights", default="", help="finetune from .caffemodel")
    t.add_argument("--snapshot_prefix", default="")
    t.add_argument("--iterations", type=int, default=50)
    t.add_argument("--sigint_effect", default="stop", choices=["stop", "snapshot", "none"])
    t.add_argument("--sighup_effect", default="snapshot", choices=["stop", "snapshot", "none"])
    t.add_argument("--level", type=int, default=0)
    t.add_argument("--stage", default="", help="comma-separated NetState stages")
    t.set_defaults(fn=cmd_train)

    te = sub.add_parser("test")
    te.add_argument("--model", required=True)
    te.add_argument("--weights", default="")
    te.add_argument("--data", default="synthetic-pose")
    te.add_argument("--iterations", type=int, default=50)
    te.add_argument("--level", type=int, default=0)
    te.add_argument("--stage", default="", help="comma-separated NetState stages")
    te.set_defaults(fn=cmd_test)

    ti = sub.add_parser("time")
    ti.add_argument("--model", required=True)
    ti.add_argument("--iterations", type=int, default=10)
    ti.add_argument("--phase", default="TEST", choices=["TRAIN", "TEST"])
    ti.add_argument("--trace_dir", default="", help="write a jax profiler trace here")
    ti.add_argument("--level", type=int, default=0)
    ti.add_argument("--stage", default="", help="comma-separated NetState stages")
    ti.set_defaults(fn=cmd_time)

    d = sub.add_parser("device_query")
    d.set_defaults(fn=cmd_device_query)
    return p


def main(argv=None) -> int:
    from ..utils import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
