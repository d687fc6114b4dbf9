#!/usr/bin/env python
"""TPU health probe: measures dispatch latency of a trivial op.

The axon-tunneled chip enters a degraded state (~30 ms per dispatch,
minutes-long compiles) after a client process is killed mid-compile; it
recovers after some idle time. Run this before trusting any benchmark
number. Exit 0 = healthy (dispatch < 1 ms), exit 1 = degraded.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    t0 = time.perf_counter()
    devices = jax.devices()
    init_s = time.perf_counter() - t0
    x = jax.device_put(np.arange(131072, dtype=np.uint32))
    f = jax.jit(lambda v: v + jnp.uint32(1))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    compile_s = time.perf_counter() - t0
    samples = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        samples.append(time.perf_counter() - t0)
    dispatch_ms = sorted(samples)[5] * 1e3
    healthy = dispatch_ms < 1.0
    print(
        f"devices={devices} init={init_s:.1f}s compile={compile_s:.1f}s "
        f"dispatch={dispatch_ms:.2f}ms -> {'HEALTHY' if healthy else 'DEGRADED'}",
        file=sys.stderr,
    )
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
