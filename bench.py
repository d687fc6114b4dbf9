#!/usr/bin/env python
"""Headline benchmark for the driver: prints ONE JSON line.

Runs the flagship kernel set on the real TPU chip and reports the headline
metric {"metric", "value", "unit", "vs_baseline"}. The baseline is the
reference's best published per-device number for the same kernel family
(BASELINE.md). Diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def time_call(fn, *args, warmup: int = 2, iters: int = 5) -> float:
    """Median wall-seconds per synchronized call."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main() -> None:
    from stringwars_tpu import datasets
    from stringwars_tpu.ops.bytesum import _bytesum_parts, _chunk_shape

    log(f"devices: {jax.devices()}")

    size = 256 << 20
    corpus = datasets.synthesize("long-lines", size)
    data = np.frombuffer(corpus, dtype=np.uint8)
    rows, chunk = _chunk_shape(size)
    padded = np.zeros(rows * chunk, dtype=np.uint8)
    padded[:size] = data
    device_data = jax.device_put(padded)

    seconds = time_call(lambda d: _bytesum_parts(d, size), device_data)
    gbps = size / seconds / 1e9
    log(f"bytesum: {gbps:.2f} GB/s over {size / 1e6:.0f} MB")

    # Reference bound: sz::bytesum 12.62 GB/s on Sapphire Rapids (BASELINE.md).
    result = {
        "metric": "bytesum_throughput",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 12.62, 2),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
