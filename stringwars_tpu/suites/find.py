"""Find suite: substring-forward / substring-backward / byteset groups
(reference ``find/bench.rs:350``, defaults 3 s + 20 s, words tokens).

Forward variants count all matches of needles cycled from the token list
over the full haystack per call (reference semantics,
``find/bench.rs:56-93``); backward variants run the distinct rfind
program (count + LAST match offset, ``find/bench.rs:144-219``); bytesets
scan three charsets per call (``find/bench.rs:226-348``), so byteset work
= 3x corpus bytes.

Device paths: on TPU the Pallas packed-word kernel scans a whole needle
batch per dispatch (``ops/find_pallas``); on CPU backends the XLA packed
compare (``ops/find``) runs instead (the Pallas interpreter is too slow
for a corpus scan). Every device variant sweeps the available scopes:
``<1chip>`` plus a sharded ``<Nchip>`` row (haystack split on the byte
axis with halos, counts psum-reduced — reference scope sweeps,
``similarities/bench.rs:376-399``).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from stringwars_tpu.ops import find as F
from stringwars_tpu.ops.ahocorasick import Automaton, ac_count
from stringwars_tpu.parallel.mesh import SHARD_AXIS, DeviceScope
from stringwars_tpu.parallel.sharding import shard_bytes
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits

BYTESETS = {
    "tabs": b"\n\r\x0b\x0c",
    "html": b"</>&'\"=[]",
    "digits": b"0123456789",
}

_ON_TPU = None


def on_tpu() -> bool:
    global _ON_TPU
    if _ON_TPU is None:
        _ON_TPU = jax.default_backend() == "tpu"
    return _ON_TPU


def staged_haystack(ctx: SuiteContext, capacity_words: int):
    data = np.asarray(ctx.tape.data)
    n = ctx.tape.total_bytes
    pad_to = n + 4 * capacity_words + 8
    if data.shape[0] < pad_to:
        data = np.pad(data, (0, pad_to - data.shape[0]))
    return jnp.asarray(data), n


def make_sharded_find(scope: DeviceScope, data: np.ndarray, n: int, cap: int, backward: bool = False):
    """Build the <Nchip> all-matches counter: byte-sharded rows with halos,
    per-shard packed compares, psum-reduced counts. The backward program
    additionally pmax-reduces the global last-match offset so the sharded
    row runs the true rfind program (count + LAST offset)."""
    overlap = 8 * cap  # >= 2*(max_m - 1), see _count_from_mask_sharded
    rows, n_glob, chunk = shard_bytes(scope, data[:n], overlap=overlap)
    row_len = chunk + overlap
    max_m = 4 * cap - 3
    n_cmp = row_len - max_m + 1

    def local(rows_blk, words, masks, length):
        needle = F.PackedNeedle(words=words, masks=masks, length=length)
        lo = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32) * chunk
        if backward:
            count, last = F._count_last_from_mask_sharded(
                rows_blk[0], needle, n_cmp, jnp.int32(chunk), lo, jnp.int32(n_glob)
            )
            return jax.lax.psum(count, SHARD_AXIS), jax.lax.pmax(last, SHARD_AXIS)
        count = F._count_from_mask_sharded(
            rows_blk[0], needle, n_cmp, jnp.int32(chunk), lo, jnp.int32(n_glob)
        )
        return jax.lax.psum(count, SHARD_AXIS)

    step = jax.jit(
        shard_map(
            local,
            mesh=scope.mesh,
            in_specs=(P(SHARD_AXIS, None), P(), P(), P()),
            out_specs=(P(), P()) if backward else P(),
            check_vma=False,
        )
    )
    return step, rows


def bench_substring(ctx: SuiteContext, group: str) -> None:
    tokens = [t for t in ctx.tape.to_list() if t]
    if not tokens:
        return
    backward = group == "substring-backward"
    capacity = 16  # <= 61-byte needles; longer tokens skipped in cycling
    usable = [t for t in tokens if len(t) <= 4 * capacity - 3]
    if not usable:
        return

    # --- device variants, one row per scope -------------------------------
    for scope in ctx.scopes:
        if scope.chips == 1:
            routine = _single_chip_routine(ctx, usable, capacity, backward)
        else:
            routine = _sharded_routine(ctx, scope, usable, capacity, backward)
        op = "rfind_count" if backward else "find_count"
        ctx.run(f"{group}/swtpu::{op}{scope.name}", "bytes", routine)

    # --- host baseline: bytes.find/rfind loop (all matches, one pass) -----
    n = ctx.tape.total_bytes
    hay_b = np.asarray(ctx.tape.data)[:n].tobytes()
    cycle = itertools.cycle(usable[:512])

    def host_routine() -> WorkUnits:
        needle = next(cycle)
        count = 0
        if backward:
            pos = len(hay_b)
            while True:
                pos = hay_b.rfind(needle, 0, pos + len(needle) - 1)
                if pos < 0:
                    break
                count += 1
        else:
            pos = 0
            while True:
                pos = hay_b.find(needle, pos)
                if pos < 0:
                    break
                count += 1
                pos += 1
        return WorkUnits(elements=max(count, 1), bytes=n)

    name = "bytes.rfind-loop" if backward else "bytes.find-loop"
    ctx.run(f"{group}/{name}", "bytes", host_routine)


def _single_chip_routine(ctx, usable, capacity, backward):
    n = ctx.tape.total_bytes
    if on_tpu():
        from stringwars_tpu.ops.find_pallas import (
            NeedleBatch,
            StagedHaystack,
            find_count_cycle,
            rfind_pallas,
        )

        staged = StagedHaystack(np.asarray(ctx.tape.data), n)

        def min_cap(t: bytes) -> int:
            # Smallest capacity bucket whose max_m = 4*cap - 3 fits the
            # needle: short needles in the 61-byte bucket pay 4x compare
            # work (the 16 B case measured 5x slower at cap=16 vs cap=8).
            for cap in (4, 8, 16):
                if len(t) <= 4 * cap - 3:
                    return cap
            return capacity

        if backward:
            packed_cycle = itertools.cycle(
                [F.pack_needle(t, min_cap(t)) for t in usable[:512]]
            )

            def routine() -> WorkUnits:
                count, _last = rfind_pallas(staged, next(packed_cycle))
                return WorkUnits(elements=max(count, 1), bytes=n)

            return routine

        batch_size = 16
        by_cap: dict[int, list] = {}
        for t in usable[:512]:
            by_cap.setdefault(min_cap(t), []).append(F.pack_needle(t, min_cap(t)))
        batches = [
            NeedleBatch(staged, packs[i : i + batch_size])
            for packs in by_cap.values()
            for i in range(0, len(packs), batch_size)
        ]
        batch_cycle = itertools.cycle(batches)

        def routine() -> WorkUnits:
            batch = next(batch_cycle)
            counts = find_count_cycle(staged, batch)
            total = int(jnp.sum(counts))
            return WorkUnits(elements=max(total, 1), bytes=batch.size * n)

        return routine

    hay, n = staged_haystack(ctx, capacity)
    packed_cycle = itertools.cycle([F.pack_needle(t, capacity) for t in usable[:512]])

    def routine() -> WorkUnits:
        needle = next(packed_cycle)
        if backward:
            count, _last = F.rfind_count(hay, needle, n)
            count = int(count)
        else:
            count = int(F.find_count(hay, needle, n))
        return WorkUnits(elements=max(count, 1), bytes=n)

    return routine


def _sharded_routine(ctx, scope, usable, capacity, backward):
    data = np.asarray(ctx.tape.data)
    n = ctx.tape.total_bytes
    step, rows = make_sharded_find(scope, data, n, capacity, backward)
    packed = [F.pack_needle(t, capacity) for t in usable[:512]]
    repl = scope.replicated
    staged_cycle = itertools.cycle(
        [
            (
                jax.device_put(np.asarray(p.words), repl),
                jax.device_put(np.asarray(p.masks), repl),
                jax.device_put(np.asarray(p.length), repl),
            )
            for p in packed[:64]
        ]
    )

    def routine() -> WorkUnits:
        words, masks, length = next(staged_cycle)
        if backward:
            count, _last = step(rows, words, masks, length)
            count = int(count)
        else:
            count = int(step(rows, words, masks, length))
        return WorkUnits(elements=max(count, 1), bytes=n)

    return routine


def bench_byteset(ctx: SuiteContext) -> None:
    tables = {name: F.pack_byteset(cs) for name, cs in BYTESETS.items()}
    n = ctx.tape.total_bytes

    for scope in ctx.scopes:
        if scope.chips == 1:
            hay, _ = staged_haystack(ctx, 0)

            def routine() -> WorkUnits:
                total = 0
                for table in tables.values():
                    total += int(F.byteset_count(hay, table, n))
                return WorkUnits(elements=max(total, 1), bytes=3 * n)

        else:
            routine = _sharded_byteset_routine(ctx, scope, tables)
        ctx.run(f"byteset-forward/swtpu::byteset_count{scope.name}", "bytes", routine)

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


def _sharded_byteset_routine(ctx, scope: DeviceScope, tables):
    data = np.asarray(ctx.tape.data)
    n = ctx.tape.total_bytes
    rows, n_glob, chunk = shard_bytes(scope, data[:n], overlap=0)

    def local(rows_blk, table):
        lo = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32) * chunk
        count = F.byteset_count_bounded(rows_blk[0], table, chunk, lo, jnp.int32(n_glob))
        return jax.lax.psum(count, SHARD_AXIS)

    step = jax.jit(
        shard_map(
            local,
            mesh=scope.mesh,
            in_specs=(P(SHARD_AXIS, None), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    repl_tables = [jax.device_put(np.asarray(t), scope.replicated) for t in tables.values()]

    def routine() -> WorkUnits:
        total = 0
        for table in repl_tables:
            total += int(step(rows, table))
        return WorkUnits(elements=max(total, 1), bytes=3 * n)

    return routine


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
    bench_substring(ctx, "substring-backward")
    ctx.group("byteset-forward")
    bench_byteset(ctx)


if __name__ == "__main__":
    main()
