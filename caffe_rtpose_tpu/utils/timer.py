"""Timer / CPUTimer (reference util/benchmark.hpp:10-47).

``Timer`` optionally synchronizes the device before reading the clock (the
cudaEvent analog: block on a marker array) so timed regions include queued
device work."""

from __future__ import annotations

import time
from typing import Optional


class CPUTimer:
    def __init__(self):
        self._start: Optional[float] = None
        self._elapsed = 0.0
        self.has_run_at_least_once = False
        self.running = False

    def start(self):
        self._start = time.perf_counter()
        self.running = True
        return self

    def stop(self):
        if self.running and self._start is not None:
            self._elapsed = time.perf_counter() - self._start
            self.running = False
            self.has_run_at_least_once = True
        return self

    def milli_seconds(self) -> float:
        return self._elapsed * 1e3

    def micro_seconds(self) -> float:
        return self._elapsed * 1e6

    def seconds(self) -> float:
        return self._elapsed


class Timer(CPUTimer):
    """Device-synchronizing timer: pass arrays whose completion delimits the
    timed region (the cudaEventSynchronize analog)."""

    def stop(self, *sync_arrays):
        import jax

        for a in sync_arrays:
            jax.block_until_ready(a)
        return super().stop()
