"""Memory suite: lookup-table / generate-random / memset / memcpy / memmove
(reference ``memory/bench.rs:110-396``, defaults 1 s + 20 s, lines tokens).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stringwars_tpu.ops import memops as M
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits, sync


def main() -> None:
    ctx = setup_suite(
        "Memory-ops throughput (LUT, PRNG fill, set/copy/move)",
        default_tokens="lines",
        default_warmup=1.0,
        default_time=20.0,
        default_synthetic="long-lines",
    )
    n = ctx.tape.total_bytes
    data = jnp.asarray(np.asarray(ctx.tape.data)[:n])
    lut = jnp.asarray(M.invert_case_lut())

    # Byte-sharded copies per scope (reference scope sweeps; these ops are
    # elementwise so pjit partitions them with zero communication — the
    # <Nchip> rows measure pure per-chip-bandwidth scaling).
    def staged_for(scope):
        if scope.chips == 1:
            return data, n
        from jax.sharding import PartitionSpec as P

        from stringwars_tpu.parallel.mesh import SHARD_AXIS

        pad = (-n) % scope.chips
        arr = np.asarray(ctx.tape.data)[:n]
        if pad:
            arr = np.pad(arr, (0, pad))
        return jax.device_put(arr, scope.sharding(P(SHARD_AXIS))), n + pad

    ctx.group("lookup-table")
    translate = jax.jit(M.lut_translate_gather)
    planes = jax.jit(M.lut_translate_planes)
    for scope in ctx.scopes:
        sdata, sn = staged_for(scope)
        ctx.run(
            f"lookup-table/swtpu::lut_translate{scope.name}",
            "bytes",
            lambda sdata=sdata, sn=sn: (sync(translate(sdata, lut)), WorkUnits(1, sn))[1],
        )
    ctx.run(
        "lookup-table/swtpu::lut_planes<1chip>",
        "bytes",
        lambda: (sync(planes(data, lut)), WorkUnits(1, n))[1],
    )
    host = np.asarray(data).tobytes()
    lut_b = M.invert_case_lut().tobytes()
    ctx.run(
        "lookup-table/bytes.translate",
        "bytes",
        lambda: (host.translate(lut_b), WorkUnits(1, n))[1],
    )
    arr = np.frombuffer(host, np.uint8)
    lut_np = M.invert_case_lut()
    ctx.run(
        "lookup-table/numpy.take",
        "bytes",
        lambda: (lut_np[arr], WorkUnits(1, n))[1],
    )

    ctx.group("generate-random")
    seed_box = [0]

    def rand_routine() -> WorkUnits:
        seed_box[0] += 1
        sync(M.fill_random(seed_box[0], n))
        return WorkUnits(1, n)

    ctx.run("generate-random/swtpu::fill_random<1chip>", "bytes", rand_routine)
    host_rng = np.random.default_rng(42)
    ctx.run(
        "generate-random/numpy.PCG64",
        "bytes",
        lambda: (host_rng.integers(0, 256, n, dtype=np.uint8), WorkUnits(1, n))[1],
    )

    ctx.group("memset")
    fill = jax.jit(M.fill, static_argnames=("n",))
    ctx.run(
        "memset/swtpu::fill<1chip>",
        "bytes",
        lambda: (sync(fill(n, 0x5A)), WorkUnits(1, n))[1],
    )

    ctx.group("memcpy")
    copy = jax.jit(M.copy)
    for scope in ctx.scopes:
        sdata, sn = staged_for(scope)
        ctx.run(
            f"memcpy/swtpu::copy{scope.name}",
            "bytes",
            lambda sdata=sdata, sn=sn: (sync(copy(sdata)), WorkUnits(1, sn))[1],
        )

    ctx.group("memmove")
    move = jax.jit(M.move, static_argnames=("shift",))
    ctx.run(
        "memmove/swtpu::move<1chip>",
        "bytes",
        lambda: (sync(move(data, 8)), WorkUnits(1, n - 8))[1],
    )


if __name__ == "__main__":
    main()
