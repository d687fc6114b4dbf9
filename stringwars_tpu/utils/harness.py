"""Measurement harness (layer L2): wall-time-budgeted device-true throughput.

The TPU analog of the reference's ``measure_throughput`` (``utils.rs:716-799``)
and pacing generators (``utils.py:74-187``): run a variant closure under a
warm-up budget (uncounted — this is also where every shape-bucket's JIT compile
must happen) and then a measured budget, recording per-call latency samples for
p50/p99. Two TPU-specific rules shape the design:

1. **Device time is the truth.** An XLA dispatch returns before the work is
   done, so the closure must synchronize — ``sync()`` below wraps
   ``block_until_ready`` over any pytree. The measured region is
   host-observed wall-time around synchronized device work, exactly the
   quantity the reference measures around its FFI calls.
2. **Compile time is excluded.** First-call tracing/compilation is hoisted
   into the warm-up phase; the warm-up always runs at least one call even
   with a zero budget so ``SWTPU_TIME=0`` still smoke-runs every variant once
   (the reference's smoke-test contract, ``similarities/bench.py:223-224``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Iterator

import jax

from stringwars_tpu.utils.config import get_env_parsed
from stringwars_tpu.utils.report import BenchStats


def now_ns() -> int:
    return time.monotonic_ns()


def sync(tree) -> None:
    """Force every array in ``tree`` to be computed on its device.

    ``block_until_ready`` alone has been observed to return before the
    tunneled device finishes executing, so one element of each leaf is
    additionally read back to the host — a read of any output element
    can only complete after the producing program ran. (Caveat that
    survives this: the tunnel memoizes REPEATED IDENTICAL dispatches, so
    a hot loop re-dispatching unchanged inputs still over-reports; the
    calibrated numbers come from ``tools/tpu_campaign.py``'s chained-loop
    protocol, and suite rows on the tunneled chip are smoke/ordering
    signals unless the variant cycles its inputs.)"""
    import numpy as np

    jax.block_until_ready(tree)
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.size:
            np.asarray(leaf.ravel()[:1])


@dataclasses.dataclass(frozen=True)
class WorkUnits:
    """Work accomplished by one closure call (reference ``utils.rs:524-545``)."""

    elements: int
    bytes: int

    def __add__(self, other: "WorkUnits") -> "WorkUnits":
        return WorkUnits(self.elements + other.elements, self.bytes + other.bytes)


@dataclasses.dataclass(frozen=True)
class BenchBudget:
    """Warm-up + measured seconds, env-overridable per suite
    (reference ``utils.rs:563-582``; per-suite defaults differ, SURVEY.md §2.1)."""

    warmup_seconds: float
    time_seconds: float

    @classmethod
    def from_env(cls, default_warmup: float, default_time: float) -> "BenchBudget":
        return cls(
            warmup_seconds=get_env_parsed("WARMUP", float(default_warmup)),
            time_seconds=get_env_parsed("TIME", float(default_time)),
        )

    def with_overrides(self, warmup: float | None, time_limit: float | None) -> "BenchBudget":
        return BenchBudget(
            warmup_seconds=self.warmup_seconds if warmup is None else warmup,
            time_seconds=self.time_seconds if time_limit is None else time_limit,
        )


def measure_throughput(routine: Callable[[], WorkUnits], budget: BenchBudget) -> BenchStats:
    """Run ``routine`` under ``budget`` and collect throughput statistics.

    ``routine`` performs one batch of device work, synchronizes, and returns
    the ``WorkUnits`` accomplished. Warm-up calls are uncounted. Both phases
    always execute at least one call.
    """
    warmup_deadline = now_ns() + int(budget.warmup_seconds * 1e9)
    while True:
        routine()
        if now_ns() >= warmup_deadline:
            break

    deadline = now_ns() + int(budget.time_seconds * 1e9)
    elements = 0
    total_bytes = 0
    latencies: list[float] = []
    started = now_ns()
    while True:
        call_start = now_ns()
        units = routine()
        call_end = now_ns()
        elements += units.elements
        total_bytes += units.bytes
        latencies.append((call_end - call_start) * 1e-9)
        if call_end >= deadline:
            break
    elapsed = (now_ns() - started) * 1e-9
    return BenchStats(
        elapsed_seconds=elapsed,
        elements=elements,
        bytes=total_bytes,
        latencies_seconds=latencies,
    )


# ---------------------------------------------------------------------------
# Host-side pacing for item-at-a-time loops (Python-kernel parity paths).
# ---------------------------------------------------------------------------

# Amortization cap and clock-read target shared with the reference's adaptive
# pacing (``utils.rs:588-589``, ``utils.py:103-139``).
PACING_STRIDE_CAP = 1024
PACING_TARGET_BETWEEN_CHECKS_NS = 1_000_000


def paced_items(items: Iterable, deadline_ns: int, step: int = PACING_STRIDE_CAP) -> Iterator:
    """Yield from ``items`` until ``deadline_ns``, with adaptive checkpoint stride.

    The stride starts at 1 and doubles toward ``step`` whenever the previous
    stride completed in under ~1 ms, so cheap items amortize the clock reads
    while one huge item can overshoot the deadline by at most itself.
    """
    stride = 1
    countdown = 1
    last_check = now_ns()
    for item in items:
        yield item
        countdown -= 1
        if countdown:
            continue
        current = now_ns()
        if current >= deadline_ns:
            return
        if current - last_check < PACING_TARGET_BETWEEN_CHECKS_NS and stride < step:
            stride = min(stride * 2, step)
        last_check = current
        countdown = stride


def clamped_subranges(count: int, stride: int = PACING_STRIDE_CAP) -> Iterator[tuple[int, int]]:
    """(low, high) windows covering [0, count) in stride-sized steps."""
    for low in range(0, count, stride):
        yield low, min(low + stride, count)


def reduce_in_windows(function, *columns, deadline_ns: int, step: int = PACING_STRIDE_CAP, combine=sum):
    """Apply ``function`` across zipped columns window-at-a-time, reducing
    each window with ``combine`` — the reference's C-map pacing trick
    (``utils.py:143-187``): the per-item loop runs inside ``map`` with the
    deadline checked once per adaptive window. Returns (total, processed).
    """
    count = min((len(column) for column in columns), default=0)
    total = 0
    low = 0
    window = 1
    last_check = now_ns()
    while low < count:
        if now_ns() >= deadline_ns:
            break
        high = min(low + window, count)
        total += combine(map(function, *(column[low:high] for column in columns)))
        current = now_ns()
        if current - last_check < PACING_TARGET_BETWEEN_CHECKS_NS and window < step:
            window = min(window * 2, step)
        last_check = current
        low = high
    return total, low
