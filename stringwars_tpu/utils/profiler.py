"""Deep-profiling guard — the TPU analog of the reference's PerfSection.

The reference wraps measured regions in an RAII guard reading hardware
counters (cycles, stalls, cache misses; ``utils.rs:849-1084``). TPUs expose
no such counters to user code; the equivalent observability here is
achieved bandwidth against the chip's HBM roofline plus an optional
``jax.profiler`` trace for op-level breakdowns:

    with PerfSection("hash", bytes_moved=corpus_bytes):
        sync(kernel(...))

prints ``# perf hash: 12.3 ms, 10.9 GB/s (1.3% of 819 GB/s roofline)`` on
exit. Set ``SWTPU_TRACE_DIR`` to also capture a profiler trace viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import sys
import time

import jax

from stringwars_tpu.utils.config import get_env

# Per-chip HBM roofline, GB/s (v5e ~819; the effective streaming rate
# observed through this stack is higher for reduce-shaped kernels).
HBM_ROOFLINE_GBPS = 819.0


class PerfSection:
    """Context manager printing elapsed time + achieved GB/s vs roofline."""

    def __init__(self, name: str, *, bytes_moved: int | None = None, minimal: bool = False):
        self.name = name
        self.bytes_moved = bytes_moved
        self.minimal = minimal
        self._trace_dir = get_env("TRACE_DIR")
        self._trace = None

    def __enter__(self):
        if self._trace_dir:
            self._trace = jax.profiler.trace(self._trace_dir)
            self._trace.__enter__()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb):
        elapsed = time.perf_counter() - self._t0
        if self._trace is not None:
            self._trace.__exit__(exc_type, exc, tb)
        if exc_type is not None:
            return False
        parts = [f"{elapsed * 1e3:.2f} ms"]
        if self.bytes_moved and not self.minimal:
            gbps = self.bytes_moved / elapsed / 1e9
            parts.append(f"{gbps:.2f} GB/s")
            parts.append(f"{100.0 * gbps / HBM_ROOFLINE_GBPS:.1f}% of {HBM_ROOFLINE_GBPS:.0f} GB/s roofline")
        print(f"# perf {self.name}: {', '.join(parts)}", file=sys.stderr, flush=True)
        return False
