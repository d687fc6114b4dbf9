"""Sequence suite: stable argsort, byte order and case-folded order
(reference ``sequence/bench.rs``, defaults 5 s + 10 s, words tokens;
work metric = n*log2(n) comparisons, ``sequence/bench.rs:79``).
"""

from __future__ import annotations

import math

import numpy as np

from stringwars_tpu.ops.sort import argsort_tape, argsort_uncased
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits


def main() -> None:
    ctx = setup_suite(
        "Stable string argsort throughput",
        default_tokens="words",
        default_warmup=5.0,
        default_time=10.0,
    )
    count = ctx.tape.count
    comparisons = int(count * math.log2(max(count, 2)))
    total = ctx.tape.total_bytes

    ctx.group("argsort")
    # Caller-owned out buffer, reference zero-alloc discipline
    # (sequence/bench.py:212-232); device sorts a 96-byte radix prefix so
    # one long line can't inflate the key matrix (ties refine host-side).
    out_buf = np.empty(count, dtype=np.intp)

    def tpu_routine() -> WorkUnits:
        argsort_tape(ctx.tape, prefix_width=96, out=out_buf)
        return WorkUnits(elements=comparisons, bytes=total)

    ctx.run("argsort/swtpu::argsort<1chip>", "comparisons", tpu_routine)

    token_list = ctx.tape.to_list()

    def host_sorted() -> WorkUnits:
        sorted(range(len(token_list)), key=token_list.__getitem__)
        return WorkUnits(elements=comparisons, bytes=total)

    ctx.run("argsort/sorted-key", "comparisons", host_sorted)

    arr = np.array(token_list, dtype=object)

    def np_routine() -> WorkUnits:
        np.argsort(arr, kind="stable")
        return WorkUnits(elements=comparisons, bytes=total)

    ctx.run("argsort/numpy.argsort", "comparisons", np_routine)

    ctx.group("argsort-uncased")

    def uncased_routine() -> WorkUnits:
        argsort_uncased(ctx.tape, prefix_width=96, out=out_buf)
        return WorkUnits(elements=comparisons, bytes=total)

    ctx.run("argsort-uncased/swtpu::argsort_uncased<1chip>", "comparisons", uncased_routine)

    def host_uncased() -> WorkUnits:
        sorted(token_list, key=lambda b: b.decode("utf-8", "ignore").casefold())
        return WorkUnits(elements=comparisons, bytes=total)

    ctx.run("argsort-uncased/sorted-casefold", "comparisons", host_uncased)


if __name__ == "__main__":
    main()
