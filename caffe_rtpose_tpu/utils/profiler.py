"""Per-layer timing — the `caffe time` equivalent (reference
tools/caffe.cpp:334-421: per-layer Forward/Backward millisecond breakdown).

Under XLA the production path is one fused program, so per-layer numbers are
diagnostic: each layer's ``apply`` is jitted standalone and timed on realized
inputs (forward), and its VJP wrt (params, bottoms) is timed for backward.
The fused whole-net time is also reported — that is the deployable number.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _block(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        leaf.block_until_ready()


def time_net(
    net,
    inputs: Dict[str, np.ndarray],
    iterations: int = 10,
    backward: bool = True,
) -> Dict[str, Dict[str, float]]:
    """Returns {layer_name: {"forward_ms": .., "backward_ms": ..}} plus
    "__total__" entries including the fused whole-net forward."""
    from ..ops import layout

    phys: Dict[str, jax.Array] = {}
    for name in net.input_names:
        arr = jnp.asarray(inputs[name])
        if net.blob_infos[name].nhwc and arr.ndim == 4:
            arr = layout.to_physical(arr)
        phys[name] = jax.device_put(arr.astype(net.dtype if net.blob_infos[name].nhwc else arr.dtype))

    # realize all intermediate blobs once
    blobs = dict(phys)
    rng = jax.random.PRNGKey(0)
    for impl in net.impls:
        bots = [blobs[b] for b in impl.bottoms]
        tops = impl.apply(net.params.get(impl.name, []), bots, rng, False, None)
        for tname, t in zip(impl.tops, tops):
            blobs[tname] = jax.device_put(t)
    _block(blobs)

    results: Dict[str, Dict[str, float]] = {}
    for impl in net.impls:
        bots = [blobs[b] for b in impl.bottoms]
        params = net.params.get(impl.name, [])
        fwd = jax.jit(lambda p, b: impl.apply(p, b, rng, False, None))
        out = fwd(params, bots)
        _block(out)
        t0 = time.perf_counter()
        for _ in range(iterations):
            out = fwd(params, bots)
        _block(out)
        fwd_ms = (time.perf_counter() - t0) / iterations * 1000

        bwd_ms = float("nan")
        if backward:
            def scalar_fn(p, b):
                tops = impl.apply(p, b, rng, True, None)
                return sum(jnp.sum(t.astype(jnp.float32)) for t in tops) if tops else jnp.float32(0)

            try:
                bwd = jax.jit(jax.grad(scalar_fn, argnums=(0, 1)))
                g = bwd(params, bots)
                _block(g)
                t0 = time.perf_counter()
                for _ in range(iterations):
                    g = bwd(params, bots)
                _block(g)
                bwd_ms = (time.perf_counter() - t0) / iterations * 1000
            except Exception:
                pass  # non-differentiable layer (Nms etc.)
        results[impl.name] = {"forward_ms": fwd_ms, "backward_ms": bwd_ms}

    # fused whole net
    fused = net.make_forward()
    out = fused(net.params, phys, rng, None)
    _block(out)
    t0 = time.perf_counter()
    for _ in range(iterations):
        out = fused(net.params, phys, rng, None)
    _block(out)
    results["__fused_forward__"] = {
        "forward_ms": (time.perf_counter() - t0) / iterations * 1000,
        "backward_ms": float("nan"),
    }
    return results


def print_timing(results: Dict[str, Dict[str, float]]) -> None:
    total_f = sum(v["forward_ms"] for k, v in results.items() if not k.startswith("__"))
    total_b = sum(v["backward_ms"] for k, v in results.items()
                  if not k.startswith("__") and np.isfinite(v["backward_ms"]))
    for name, v in results.items():
        if name.startswith("__"):
            continue
        b = f"{v['backward_ms']:10.3f}" if np.isfinite(v["backward_ms"]) else "       n/a"
        print(f"{name:>28}  forward: {v['forward_ms']:10.3f} ms  backward: {b} ms")
    print(f"{'TOTAL (per-layer sum)':>28}  forward: {total_f:10.3f} ms  backward: {total_b:10.3f} ms")
    fused = results.get("__fused_forward__")
    if fused:
        print(f"{'FUSED whole-net forward':>28}  {fused['forward_ms']:10.3f} ms")
