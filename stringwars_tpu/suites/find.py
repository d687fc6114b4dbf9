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
from stringwars_tpu.ops.ahocorasick import Automaton
from stringwars_tpu.parallel.mesh import SHARD_AXIS, DeviceScope
from stringwars_tpu.parallel.sharding import shard_bytes
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import DeviceRoutine, WorkUnits, fold_salt

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


def make_sharded_find_pallas(
    scope: DeviceScope, data: np.ndarray, n: int, cap: int, backward: bool = False,
    *, interpret: bool = False,
):
    """<Nchip> production path over the Pallas packed-word panel kernel.

    The haystack is cut into per-chip byte chunks with an ``8*cap``-word
    halo, each chunk staged into the kernel's interleaved word-row layout
    host-side, and the chip axis sharded. Each chip counts the window
    starts it OWNS (``p < chunk`` locally and ``lo + p <= n - m``
    globally, expressed through the kernel's own ``meta`` bound
    ``n_local = min(chunk + m - 1, n - lo)``); counts psum, rfind offsets
    pmax in global coordinates. Returns (step, None) where
    ``step(words4, masks4, length)`` runs one needle.
    """
    from stringwars_tpu.ops.find_pallas import _count, _count_last, stage_words

    max_m = 4 * cap - 3
    overlap = 8 * cap  # bytes; >= max_m - 1 with headroom
    chips = scope.chips
    chunk = (-(-n // chips) + 511) // 512 * 512
    buf = np.zeros(chips * chunk + overlap, np.uint8)
    buf[:n] = data[:n]
    staged = []
    chunkw = None
    for i in range(chips):
        seg = buf[i * chunk : (i + 1) * chunk + overlap]
        rows_i, chunkw = stage_words(seg, seg.shape[0])
        staged.append(rows_i)
    rows_dev = jax.device_put(
        np.stack(staged), scope.sharding(P(SHARD_AXIS, None, None))
    )

    def local(rows_blk, words4, masks4, length):
        lo = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32) * chunk
        m = length.astype(jnp.int32)
        n_local = jnp.minimum(jnp.int32(chunk) + m - 1, jnp.int32(n) - lo)
        meta = jnp.stack([n_local, m, jnp.int32(chunkw)])
        if backward:
            count, last = _count_last(rows_blk[0], words4, masks4, meta, cap, interpret)
            glob_last = jnp.where(last >= 0, lo + last, -1)
            return (
                jax.lax.psum(count, SHARD_AXIS),
                jax.lax.pmax(glob_last, SHARD_AXIS),
            )
        count = _count(rows_blk[0], words4, masks4, meta, cap, interpret)
        return jax.lax.psum(count, SHARD_AXIS)

    inner = shard_map(
        local,
        mesh=scope.mesh,
        in_specs=(P(SHARD_AXIS, None, None), P(), P(), P()),
        out_specs=(P(), P()) if backward else P(),
        check_vma=False,
    )
    step = jax.jit(lambda w4, m4, ln: inner(rows_dev, w4, m4, ln))
    return step, rows_dev, inner


def bench_substring(ctx: SuiteContext, group: str) -> None:
    tokens = [t for t in ctx.tape.to_list() if t]
    if not tokens:
        return
    backward = group == "substring-backward"
    capacity = 16  # default bucket; _min_cap picks per-needle buckets
    usable = tokens  # EVERY token is a needle (reference find/bench.rs:56-93)

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


def _needle_cap(t: bytes) -> int:
    """Capacity bucket for ANY needle length: panel buckets up to 505 B,
    then 64-word-quantized capacities (keeps the jit-program count low
    on long-line corpora)."""
    for cap in (4, 8, 16, 32, 64, 127):
        if len(t) <= 4 * cap - 3:
            return cap
    need = (len(t) + 6) // 4
    return -(-need // 64) * 64


def _min_cap(t: bytes, fallback: int) -> int:
    # Smallest capacity bucket whose max_m = 4*cap - 3 fits the needle:
    # short needles in a big bucket pay proportionally more compare work
    # (the 16 B case measured 5x slower at cap=16 vs cap=8). Buckets up to
    # 127 words (505 B needles) fit the Pallas panel halo; longer tokens
    # route through the XLA packed compare (no capacity ceiling) so the
    # suite cycles EVERY token like the reference (find/bench.rs:56-93).
    for cap in (4, 8, 16, 32, 64, 127):
        if len(t) <= 4 * cap - 3:
            return cap
    return fallback


def _single_chip_routine(ctx, usable, capacity, backward):
    n = ctx.tape.total_bytes
    if on_tpu():
        return _pallas_chained_routine(ctx, usable, capacity, backward, n)

    max_cap = max(_needle_cap(t) for t in usable[:512])
    hay, n = staged_haystack(ctx, max_cap)
    packed_cycle = itertools.cycle([F.pack_needle(t, _needle_cap(t)) for t in usable[:512]])

    def routine() -> WorkUnits:
        needle = next(packed_cycle)
        if backward:
            count, _last = F.rfind_count(hay, needle, n)
            count = int(count)
        else:
            count = int(F.find_count(hay, needle, n))
        return WorkUnits(elements=max(count, 1), bytes=n)

    return routine


def _pallas_chained_routine(ctx, usable, capacity, backward, n):
    """Chained-loop DeviceRoutine over the Pallas packed-word panel kernel.

    Each iteration XORs a salt spread into the (corpus-drawn) needle words,
    so needles vary with full entropy per trip — the tunnel cannot memoize
    — while the all-matches scan cost stays the real workload's (compare
    work is data-independent).
    """
    from stringwars_tpu.ops.find_pallas import (
        NeedleBatch,
        StagedHaystack,
        _count_batch,
        _count_last,
        _needle_operands,
    )

    staged = StagedHaystack(np.asarray(ctx.tape.data), n)
    spread_of = lambda s: jax.lax.bitcast_convert_type(  # noqa: E731
        s * jnp.uint32(0x9E3779B1), jnp.int32
    )

    panel_ok = [t for t in usable if len(t) <= 4 * 127 - 3]
    huge = [t for t in usable if len(t) > 4 * 127 - 3][:2]

    if backward:
        if panel_ok:
            packed = F.pack_needle(panel_ok[0], _min_cap(panel_ok[0], capacity))
            words4, masks4, meta, k_words = _needle_operands(staged, packed)

            def body(s, e, rows, w4, m4, mt):
                count, last = _count_last(rows, w4 ^ spread_of(s), m4, mt, k_words)
                return fold_salt(s, count, last), e

            return DeviceRoutine(
                body=body,
                consts=(staged.rows, words4, masks4, meta),
                units=WorkUnits(elements=1, bytes=n),
            )
        # Only huge needles: XLA rfind program (no capacity ceiling).
        packed = F.pack_needle(usable[0], _needle_cap(usable[0]))
        hay_flat = jnp.asarray(F._staged(jnp.asarray(np.asarray(ctx.tape.data)), n, packed.capacity))

        def body(s, e, hay_c, w, m, ln):
            nd = F.PackedNeedle(words=w ^ (s * jnp.uint32(0x9E3779B1)), masks=m, length=ln)
            count, last = F._count_last_from_mask(hay_c, nd, n)
            return fold_salt(s, count, last), e

        return DeviceRoutine(
            body=body,
            consts=(hay_flat, packed.words, packed.masks, packed.length),
            units=WorkUnits(elements=1, bytes=n),
        )

    batch_size = 16
    by_cap: dict[int, list] = {}
    for t in panel_ok[:512]:
        by_cap.setdefault(_min_cap(t, capacity), []).append(F.pack_needle(t, _min_cap(t, capacity)))
    batches = [NeedleBatch(staged, packs[:batch_size]) for packs in by_cap.values()]
    flat_consts = []
    for b in batches:
        flat_consts += [b.words4, b.masks4, b.meta]
    total_needles = sum(b.size for b in batches)
    caps = [b.k_words for b in batches]

    # Needles past the panel halo (505 B) ride the XLA packed compare in
    # the same chained body, so long-line corpora measure the REAL
    # every-token workload (reference find/bench.rs:56-93).
    huge_consts = []
    if huge:
        hp = [F.pack_needle(t, _needle_cap(t)) for t in huge]
        hay_flat = jnp.asarray(
            F._staged(jnp.asarray(np.asarray(ctx.tape.data)), n, max(p.capacity for p in hp))
        )
        huge_consts = [hay_flat]
        for p in hp:
            huge_consts += [p.words, p.masks, p.length]

    def body(s, e, rows, *flat):
        spread = spread_of(s)
        outs = []
        for i, k_words in enumerate(caps):
            w4, m4, mt = flat[3 * i : 3 * i + 3]
            outs.append(_count_batch(rows, w4 ^ spread, m4, mt, k_words, False))
        if huge:
            base = 3 * len(caps)
            hay_c = flat[base]
            for j in range(len(huge)):
                w, m, ln = flat[base + 1 + 3 * j : base + 4 + 3 * j]
                nd = F.PackedNeedle(words=w ^ (s * jnp.uint32(0x9E3779B1)), masks=m, length=ln)
                outs.append(F._count_from_mask(hay_c, nd, n))
        return fold_salt(s, *outs), e

    total = total_needles + len(huge)
    return DeviceRoutine(
        body=body,
        consts=(staged.rows, *flat_consts, *huge_consts),
        units=WorkUnits(elements=total, bytes=total * n),
    )


def _sharded_routine(ctx, scope, usable, capacity, backward):
    data = np.asarray(ctx.tape.data)
    n = ctx.tape.total_bytes
    if on_tpu():
        return _sharded_pallas_routine(ctx, scope, usable, capacity, backward, data, n)
    fitting = [t for t in usable if len(t) <= 4 * capacity - 3] or [usable[0][: 4 * capacity - 3]]
    step, rows = make_sharded_find(scope, data, n, capacity, backward)
    packed = [F.pack_needle(t, capacity) for t in fitting[:512]]
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


def _sharded_pallas_routine(ctx, scope, usable, capacity, backward, data, n):
    """<Nchip> on TPU: the Pallas panel kernel, sharded + chained."""
    _step, rows_dev, inner = make_sharded_find_pallas(scope, data, n, capacity, backward)
    packed = F.pack_needle(usable[0], capacity)
    words4 = jax.lax.bitcast_convert_type(jnp.asarray(packed.words), jnp.int32)
    masks4 = jax.lax.bitcast_convert_type(jnp.asarray(packed.masks), jnp.int32)
    length = jnp.asarray(packed.length)
    spread_of = lambda s: jax.lax.bitcast_convert_type(  # noqa: E731
        s * jnp.uint32(0x9E3779B1), jnp.int32
    )

    def body(s, e, rows_c, w4, m4, ln):
        out = inner(rows_c, w4 ^ spread_of(s), m4, ln)
        return fold_salt(s, out), e

    return DeviceRoutine(
        body=body,
        consts=(rows_dev, words4, masks4, length),
        units=WorkUnits(elements=1, bytes=n),
    )


def bench_byteset(ctx: SuiteContext) -> None:
    tables = {name: F.pack_byteset(cs) for name, cs in BYTESETS.items()}
    n = ctx.tape.total_bytes

    for scope in ctx.scopes:
        if scope.chips == 1:
            hay, _ = staged_haystack(ctx, 0)
            tabs = jnp.stack(list(tables.values()))

            def body(s, e, hay_, tabs_):
                # Perturb each membership table with full byte entropy so
                # no two iterations scan for the same set (anti-memoization).
                from stringwars_tpu.utils.harness import perturb_u8

                outs = [
                    F.byteset_count(hay_, tabs_[i] ^ perturb_u8(s), n)
                    for i in range(tabs_.shape[0])
                ]
                return fold_salt(s, *outs), e

            routine = DeviceRoutine(
                body=body, consts=(hay, tabs), units=WorkUnits(elements=1, bytes=3 * n)
            )
        else:
            routine = _sharded_byteset_routine(ctx, scope, tables)
        ctx.run(f"byteset-forward/swtpu::byteset_count{scope.name}", "bytes", routine)

    from stringwars_tpu.ops.ahocorasick import (
        _ac_scan,
        _ac_scan_pallas,
        _ac_scan_pallas_lut,
        automaton_luts,
        automaton_rules,
        stage_cols,
        stage_rows,
    )
    from stringwars_tpu.utils.harness import perturb_u8

    automata = {name: Automaton([bytes([c]) for c in cs]) for name, cs in BYTESETS.items()}
    hay_np = np.asarray(ctx.tape.data)[:n]
    staged_acs = []
    flat_ac_consts: list = []
    if on_tpu():
        # Small sets ride the size-independent Shift-And kernel; bigger
        # sets fall back to the Pallas flat-key DFA rule scan.
        from stringwars_tpu.ops.shiftand import MAX_BITS, ShiftAndSet, _sa_scan, stage_masks

        for name, cs in BYTESETS.items():
            a = automata[name]
            total_len = len(cs)  # single-byte patterns
            try:
                sa = ShiftAndSet([bytes([c]) for c in cs]) if total_len <= MAX_BITS else None
            except ValueError:  # doesn't pack into the state words
                sa = None
            if sa is not None:
                cols, gpos0, overlap, limit = stage_cols(hay_np, n, sa.max_len)
                staged_acs.append(("sa", overlap))
                flat_ac_consts += [
                    jnp.asarray([n, limit], jnp.int32), stage_masks(sa), cols, gpos0,
                ]
            else:
                cols, gpos0, overlap, limit = stage_cols(hay_np, n, a.max_len)
                mode, n_pm, tables = automaton_luts(a)
                if mode is not None:
                    staged_acs.append((("lut", mode, n_pm, len(tables)), overlap))
                    flat_ac_consts += [
                        jnp.asarray([n, limit], jnp.int32), cols, gpos0, *tables,
                    ]
                else:
                    key_rules, oc_rules = automaton_rules(a)
                    staged_acs.append(((key_rules.count, oc_rules.count), overlap))
                    flat_ac_consts += [
                        jnp.asarray(key_rules.starts), jnp.asarray(key_rules.deltas),
                        jnp.asarray(oc_rules.starts), jnp.asarray(oc_rules.deltas),
                        jnp.asarray([n, limit], jnp.int32), cols, gpos0,
                    ]

        def ac_body(s, e, *flat):
            # Perturbing the DFA tables would corrupt state ids; perturb the
            # haystack bytes instead — scan cost is data-independent.
            outs = []
            at = 0
            for kind, overlap in staged_acs:
                if kind == "sa":
                    meta, masks, cols, gpos0 = flat[at : at + 4]
                    at += 4
                    outs.append(
                        _sa_scan(
                            meta, masks, cols ^ perturb_u8(s).astype(jnp.int32),
                            gpos0, overlap, False,
                        )
                    )
                elif kind[0] == "lut":
                    _, mode, n_pm, n_tab = kind
                    meta, cols, gpos0 = flat[at : at + 3]
                    tabs = flat[at + 3 : at + 3 + n_tab]
                    at += 3 + n_tab
                    outs.append(
                        _ac_scan_pallas_lut(
                            tuple(tabs), meta,
                            cols ^ perturb_u8(s).astype(jnp.int32),
                            gpos0, mode, n_pm, overlap, False,
                        )
                    )
                else:
                    n_r, n_oc = kind
                    ks, kd, os_, od, meta, cols, gpos0 = flat[at : at + 7]
                    at += 7
                    outs.append(
                        _ac_scan_pallas(
                            ks, kd, os_, od, meta,
                            cols ^ perturb_u8(s).astype(jnp.int32),
                            gpos0, n_r, n_oc, overlap, False,
                        )
                    )
            return fold_salt(s, *outs), e

    else:
        for a in automata.values():
            rows_dev, gpos0, chunk = stage_rows(hay_np, n, a.max_len, None, False)
            staged_acs.append((a, chunk))
            flat_ac_consts += [a.delta_flat, a.out_count, rows_dev, gpos0]

        def ac_body(s, e, *flat):
            outs = []
            for i, (_a, chunk) in enumerate(staged_acs):
                tab, out_c, rows_dev, gpos0 = flat[4 * i : 4 * i + 4]
                outs.append(_ac_scan(tab, out_c, rows_dev ^ perturb_u8(s), gpos0, n, chunk))
            return fold_salt(s, *outs), e

    ctx.run(
        "byteset-forward/swtpu::aho_corasick<1chip>",
        "bytes",
        DeviceRoutine(
            body=ac_body, consts=tuple(flat_ac_consts), units=WorkUnits(elements=1, bytes=3 * n)
        ),
    )

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
