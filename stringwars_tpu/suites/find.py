"""Find suite: substring-forward / substring-backward / byteset groups
(reference ``find/bench.rs:350``, defaults 3 s + 20 s, words tokens).

Forward/backward variants count all matches of needles cycled from the
token list over the full haystack per call (reference semantics,
``find/bench.rs:56-93``); bytesets scan three charsets per call
(``find/bench.rs:226-348``), so byteset work = 3x corpus bytes.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

from stringwars_tpu.ops import find as F
from stringwars_tpu.ops.ahocorasick import Automaton, ac_count
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits, now_ns, paced_items

BYTESETS = {
    "tabs": b"\n\r\x0b\x0c",
    "html": b"</>&'\"=[]",
    "digits": b"0123456789",
}


def staged_haystack(ctx: SuiteContext, capacity_words: int):
    data = np.asarray(ctx.tape.data)
    n = ctx.tape.total_bytes
    pad_to = n + 4 * capacity_words + 8
    if data.shape[0] < pad_to:
        data = np.pad(data, (0, pad_to - data.shape[0]))
    return jnp.asarray(data), n


def bench_substring(ctx: SuiteContext, group: str) -> None:
    tokens = [t for t in ctx.tape.to_list() if t]
    if not tokens:
        return
    capacity = 16  # 61-byte needles; longer tokens skipped in cycling
    hay, n = staged_haystack(ctx, capacity)
    usable = [t for t in tokens if len(t) <= 4 * capacity - 3]
    packed_cycle = itertools.cycle([F.pack_needle(t, capacity) for t in usable[:512]])

    def routine() -> WorkUnits:
        needle = next(packed_cycle)
        count = int(F.find_count(hay, needle, n))
        return WorkUnits(elements=max(count, 1), bytes=n)

    ctx.run(f"{group}/swtpu::find_count<1chip>", "bytes", routine)

    # Host baseline: bytes.find loop (all matches, one haystack pass).
    hay_b = np.asarray(ctx.tape.data)[:n].tobytes()
    cycle = itertools.cycle(usable[:512])

    def host_routine() -> WorkUnits:
        needle = next(cycle)
        pos = 0
        count = 0
        while True:
            pos = hay_b.find(needle, pos)
            if pos < 0:
                break
            count += 1
            pos += 1
        return WorkUnits(elements=max(count, 1), bytes=n)

    ctx.run(f"{group}/bytes.find-loop", "bytes", host_routine)


def bench_byteset(ctx: SuiteContext) -> None:
    hay, n = staged_haystack(ctx, 0)
    tables = {name: F.pack_byteset(cs) for name, cs in BYTESETS.items()}

    def routine() -> WorkUnits:
        total = 0
        for table in tables.values():
            total += int(F.byteset_count(hay, table, n))
        return WorkUnits(elements=max(total, 1), bytes=3 * n)

    ctx.run("byteset-forward/swtpu::byteset_count<1chip>", "bytes", routine)

    automata = {name: Automaton([bytes([c]) for c in cs]) for name, cs in BYTESETS.items()}
    hay_np = np.asarray(ctx.tape.data)[:n]

    def ac_routine() -> WorkUnits:
        total = 0
        for a in automata.values():
            total += ac_count(a, hay_np, n)
        return WorkUnits(elements=max(total, 1), bytes=3 * n)

    ctx.run("byteset-forward/swtpu::aho_corasick<1chip>", "bytes", ac_routine)

    import re

    hay_b = hay_np.tobytes()
    regexes = {name: re.compile(b"[" + re.escape(cs) + b"]") for name, cs in BYTESETS.items()}

    def re_routine() -> WorkUnits:
        total = sum(len(r.findall(hay_b)) for r in regexes.values())
        return WorkUnits(elements=max(total, 1), bytes=3 * n)

    ctx.run("byteset-forward/re.findall", "bytes", re_routine)


def main() -> None:
    ctx = setup_suite(
        "Substring and byteset search throughput",
        default_tokens="words",
        default_warmup=3.0,
        default_time=20.0,
    )
    ctx.group("substring-forward")
    bench_substring(ctx, "substring-forward")
    ctx.group("substring-backward")
    # Reverse scans share the match set on a data-parallel machine; the
    # variant exists for name/work parity (ops/find.py docstring).
    bench_substring(ctx, "substring-backward")
    ctx.group("byteset-forward")
    bench_byteset(ctx)


if __name__ == "__main__":
    main()
