"""Frame-parallel multi-device inference.

The reference runs one full net replica per GPU, each worker thread pulling
frames from a shared queue (rtpose.cpp:1463-1472 + NetCopy).  The TPU-native
analog: replicate the estimator's params onto each device and round-robin
frame dispatch — each dispatch is an async XLA execution on its device, so a
single host thread keeps N chips busy and the fetcher pool drains results.
"""

from __future__ import annotations

import itertools
from typing import List, Optional

import jax
import numpy as np


class DevicePool:
    """Round-robin frame dispatcher over N devices for a PoseEstimator."""

    def __init__(self, estimator, num_devices: Optional[int] = None, start_device: int = 0):
        self.est = estimator
        devs = jax.devices()
        n = num_devices or len(devs)
        if start_device + n > len(devs):
            raise ValueError(f"need devices [{start_device}, {start_device+n}), have {len(devs)}")
        self.devices: List = devs[start_device : start_device + n]
        # replicate params once per device
        self._params = [
            jax.device_put(self.est.net.params, d) for d in self.devices
        ]
        self._rr = itertools.cycle(range(len(self.devices)))

    def run_device(self, net_input: np.ndarray, nms_threshold=None, inter_threshold=None,
                   device_index: Optional[int] = None):
        import jax.numpy as jnp

        from ..ops import layout

        i = next(self._rr) if device_index is None else device_index
        dev = self.devices[i]
        p = self.est.params_connect
        nms_thr = jax.device_put(
            jnp.float32(p.nms_threshold if nms_threshold is None else nms_threshold), dev)
        inter_thr = jax.device_put(
            jnp.float32(p.inter_threshold if inter_threshold is None else inter_threshold), dev)
        if self.est.input_u8:
            x = jax.device_put(net_input, dev)
        else:
            x = jax.device_put(
                layout.to_physical(jnp.asarray(net_input)).astype(self.est.net.dtype), dev)
        return self.est._compiled(self._params[i], x, nms_thr, inter_thr)

    def fetch(self, out):
        return self.est.fetch(out)
