"""Multi-host (multi-process) data-parallel training dryrun — SURVEY §7.6.

The single-process DP path (`parallel/dp.py`) replaces the reference's
P2PSync CUDA-P2P tree (src/caffe/parallel.cpp:287-380) with a replicated-
params / sharded-batch mesh where XLA inserts the gradient all-reduce.  On
a real pod the same program spans HOSTS: each process owns a slice of the
mesh and the all-reduce rides ICI within a host and DCN across hosts.
This module demonstrates that path without pod hardware: N processes x K
virtual CPU devices each, connected by `jax.distributed.initialize`
(cross-process collectives over the Gloo backend), running the SAME
`make_dp_train_step` on the full 6-stage CPM train graph — no multi-host
special-casing in the training code itself, which is the point.

Checked against a 1-process run of the identical step on the identical
global batch: loss and updated parameters must agree to float tolerance
(the cross-process all-reduce may associate sums differently than the
intra-process one, so exact bit equality is not guaranteed).

Usage:
  worker (one per "host"):
    python -m caffe_rtpose_tpu.parallel.multihost --worker \
        --coordinator 127.0.0.1:PORT --num-processes 2 --process-id I \
        --devices-per-process 4 --out digest.json
  orchestrated dryrun (spawns the workers + the 1-process reference):
    from caffe_rtpose_tpu.parallel.multihost import dryrun_multihost
    dryrun_multihost(num_processes=2, devices_per_process=4)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys


def _gloo_warmup(retries: int = 3) -> None:
    """Establish the cross-process Gloo context BEFORE any expensive
    compile, and retry if the full-mesh rendezvous times out.

    XLA's Gloo backend lazily builds its full-mesh context at the FIRST
    cross-process collective, and its key-value rendezvous has a
    hard-coded 30 s GetKeyValue deadline (not exposed through
    `jax.distributed.initialize`).  Without a warm-up, each worker's
    first collective sits BEHIND the minutes-long train-step compile;
    on a loaded single-CPU box the compile-time skew between workers
    exceeds 30 s and the faster worker dies with
    `Gloo context initialization failed: DEADLINE_EXCEEDED`.  A trivial
    psum compiled in milliseconds right after initialize() puts every
    process into the rendezvous within a tight window; the later big
    collectives reuse the established context.  Each retry re-enters
    the rendezvous, so residual skew (slow interpreter start on a
    contended box) gets a fresh 30 s window.
    """
    import time

    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("d",))
    sharded = NamedSharding(mesh, P("d"))
    local = np.ones((len(jax.local_devices()),), np.float32)
    x = jax.make_array_from_process_local_data(sharded, local)
    tiny_psum = jax.jit(lambda a: a.sum(),
                        out_shardings=NamedSharding(mesh, P()))
    last_err = None
    for attempt in range(retries):
        try:
            total = float(jax.device_get(tiny_psum(x)))
            assert total == float(len(jax.devices())), total
            return
        except AssertionError:
            raise
        except Exception as e:  # rendezvous DEADLINE_EXCEEDED and kin
            last_err = e
            print(f"gloo warmup attempt {attempt + 1}/{retries} failed "
                  f"({type(e).__name__}); retrying", flush=True)
            time.sleep(2.0 * (attempt + 1))
    raise RuntimeError(
        f"Gloo warm-up collective failed after {retries} attempts"
    ) from last_err


def _worker(coordinator: str, num_processes: int, process_id: int,
            crop: int, batch: int, out_path: str) -> None:
    """Run ONE data-parallel CPM train step as one process of a
    multi-process mesh and dump a digest (loss + per-leaf f64 param sums).

    Must be the first jax touch in the process: platform/device-count env
    is set by `_spawn` before the interpreter starts.
    """
    import jax

    # a site hook may pre-register an accelerator plugin and rewrite
    # JAX_PLATFORMS after _spawn set it; force the CPU backend explicitly
    # (same guard as tests/conftest.py) — the dryrun's virtual devices
    # only exist on the host platform
    jax.config.update("jax_platforms", "cpu")

    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id,
            initialization_timeout=600)
        # MUST precede the big train-step compile — see _gloo_warmup.
        _gloo_warmup()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.net import Net
    from ..models.cpm import make_pose_train_net
    from ..ops import layout
    from ..proto import caffe_pb, prototxt
    from ..training.solver import init_history, make_update_fn
    from .dp import make_dp_train_step, make_mesh

    net_param = make_pose_train_net(batch=batch, crop=crop, stages=6)
    net = Net(net_param, phase="TRAIN", seed=0)  # same seed on every host
    sp_msg = prototxt.parse(
        'base_lr: 0.000040 lr_policy: "fixed" momentum: 0.9 '
        'weight_decay: 0.0005 type: "SGD"', "SolverParameter")
    sp = caffe_pb.view(sp_msg, "SolverParameter")
    lr_mults = {i.name: [pi.lr_mult for pi in i.params]
                for i in net.impls if i.params}
    decay_mults = {i.name: [pi.decay_mult for pi in i.params]
                   for i in net.impls if i.params}
    update_fn = make_update_fn("SGD", sp, lr_mults, decay_mults)
    loss_fn = net.make_loss_fn()

    mesh = make_mesh()  # ALL global devices, across processes
    step = make_dp_train_step(mesh, loss_fn, update_fn)

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    def put_replicated(tree):
        # every process holds the same host value (same seed), so the
        # replicated global array is consistent across processes
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(
                repl, np.asarray(a)), tree)

    params = put_replicated(net.params)
    history = put_replicated(init_history("SGD", net.params))

    # identical GLOBAL batch on every process (same seed); each process
    # feeds only its local rows
    grid = crop // 8
    np_ch = 2 * (38 + 19 - 1 + 1)  # transformer label layout: 2*(np+1)
    rs = np.random.RandomState(0)
    global_batch = {
        "data": layout.to_physical(
            rs.rand(batch, 3, crop, crop).astype(np.float32) - 0.5),
        "label": layout.to_physical(
            rs.rand(batch, np_ch, grid, grid).astype(np.float32)),
    }
    assert batch % num_processes == 0
    rows = batch // num_processes
    lo, hi = process_id * rows, (process_id + 1) * rows
    inputs = {
        k: jax.make_array_from_process_local_data(data_sh, v[lo:hi])
        for k, v in global_batch.items()
    }

    with mesh:
        loss, new_params, _ = step(
            params, history, inputs, jax.random.PRNGKey(0),
            jnp.float32(4e-5), 0)

    digest = {
        "num_processes": num_processes,
        "n_devices": len(jax.devices()),
        "loss": float(np.asarray(jax.device_get(loss))),
        "param_sums": {
            name: [float(np.asarray(
                jax.device_get(p)).astype(np.float64).sum()) for p in plist]
            for name, plist in sorted(new_params.items())
        },
    }
    if process_id == 0 and out_path:
        with open(out_path, "w") as f:
            json.dump(digest, f)
    print(f"multihost worker {process_id}/{num_processes}: "
          f"{len(jax.local_devices())} local / {len(jax.devices())} global "
          f"devices, loss={digest['loss']:.6f}", flush=True)
    if num_processes > 1:
        # explicit synchronized shutdown: without it the faster worker
        # exits early and the laggard logs a benign-but-noisy
        # shutdown-barrier DEADLINE_EXCEEDED
        jax.distributed.shutdown()


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(num_processes: int, process_id: int, devices_per_process: int,
           coordinator: str, crop: int, batch: int, out: str):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devices_per_process}",
    )
    # a worker must not inherit a parent's distributed service state
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    return subprocess.Popen(
        [sys.executable, "-m", "caffe_rtpose_tpu.parallel.multihost",
         "--worker", "--coordinator", coordinator,
         "--num-processes", str(num_processes),
         "--process-id", str(process_id),
         "--crop", str(crop), "--batch", str(batch), "--out", out],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def dryrun_multihost(num_processes: int = 2, devices_per_process: int = 4,
                     crop: int = 64, batch: int = 8, timeout: int = 900,
                     workdir: str = "/tmp") -> None:
    """N-process DP train step == 1-process train step on the same global
    batch and mesh size (both run as subprocesses with their own device
    counts; the parent process's jax state is untouched)."""
    import numpy as np

    n_total = num_processes * devices_per_process
    digests = {}
    for label, procs, per in (("multi", num_processes, devices_per_process),
                              ("single", 1, n_total)):
        out = os.path.join(workdir, f"mh_digest_{label}_{os.getpid()}.json")
        coord = f"127.0.0.1:{_free_port()}"
        workers = [_spawn(procs, i, per, coord, crop, batch,
                          out if i == 0 else "")
                   for i in range(procs)]
        logs = []
        timed_out = False
        for w in workers:
            try:
                stdout, _ = w.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                w.kill()
                stdout, _ = w.communicate()
                timed_out = True
            logs.append(stdout)
            if timed_out:
                # environment failure (box too loaded to finish inside the
                # budget), not a parity failure — raise a distinct type so
                # callers can skip gracefully without masking real diffs
                raise RuntimeError(
                    f"multihost dryrun environment failure: {label} worker "
                    f"exceeded {timeout}s\n{stdout[-2000:]}")
            assert w.returncode == 0, (
                f"{label} worker failed:\n{stdout[-2000:]}")
        with open(out) as f:
            digests[label] = json.load(f)
        os.unlink(out)

    m, s = digests["multi"], digests["single"]
    assert m["n_devices"] == s["n_devices"] == n_total
    assert np.isfinite(m["loss"])
    np.testing.assert_allclose(m["loss"], s["loss"], rtol=1e-5,
                               err_msg="multi-host loss != single-process")
    for name in s["param_sums"]:
        np.testing.assert_allclose(
            m["param_sums"][name], s["param_sums"][name],
            rtol=1e-4, atol=1e-5,
            err_msg=f"updated params diverge at layer {name}")
    print(f"dryrun_multihost: {num_processes} processes x "
          f"{devices_per_process} devices, 6-stage CPM DP train step == "
          f"1-process x {n_total} devices (loss {m['loss']:.6f}) OK")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    if args.worker:
        _worker(args.coordinator, args.num_processes, args.process_id,
                args.crop, args.batch, args.out)
        return 0
    dryrun_multihost(num_processes=args.num_processes or 2,
                     devices_per_process=args.devices_per_process)
    return 0


if __name__ == "__main__":
    sys.exit(main())
