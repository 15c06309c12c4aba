"""Section profiler.

TPU-native equivalent of the reference's ``Profiler``
(/root/reference/core/visualize/profiler.py:6-32), whose
``torch.cuda.synchronize()``-bracketed wall timing maps to
``jax.block_until_ready`` here; additionally exposes the XLA trace profiler
(``jax.profiler``) for kernel-level inspection in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Profiler:
    """Accumulating wall-clock section timer (device-synchronized)."""

    def __init__(self, silent: bool = False):
        self.silent = silent
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._starts = {}

    def start(self, name: str = "default") -> None:
        self._starts[name] = time.perf_counter()

    def end(self, name: str = "default", sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._starts.pop(name)
        self.totals[name] += dt
        self.counts[name] += 1
        if not self.silent:
            print(f"[profiler] {name}: {dt * 1e3:.2f} ms")
        return dt

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        self.start(name)
        try:
            yield
        finally:
            self.end(name, sync_on=sync_on)

    def report_all(self) -> dict[str, float]:
        report = {}
        for name, total in self.totals.items():
            n = self.counts[name]
            report[name] = total / max(n, 1)
            if not self.silent:
                print(f"[profiler] {name}: {n} calls, avg {report[name] * 1e3:.2f} ms")
        return report


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
