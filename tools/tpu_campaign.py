#!/usr/bin/env python
"""Measure kernel families on the real TPU chip; JSON results to stdout.

Protocol learned the hard way: the tunneled device client degrades to a
~28 ms dispatch floor within a process after heavy compile/load activity
and never recovers in-process (a fresh process is instantly healthy). So:
  1. every bench's setup (device_put, layout prepare, compiles) is LAZY;
  2. measure one kernel per process: ``--only <name>``;
  3. populate the persistent compile cache first with ``--compile-only``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Persist compiled executables across processes: the per-process measurement
# protocol depends on warm-cache processes compiling in ~0 s (a fresh heavy
# compile degrades every dispatch for ~10 min afterwards).
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Surface cache write failures / key mismatches instead of silent misses —
# several multi-minute kernels were observed recompiling every process.
jax.config.update("jax_raise_persistent_cache_errors", True)
jax.config.update("jax_debug_log_modules", "jax._src.compilation_cache,jax._src.compiler")

RESULTS: dict[str, dict] = {}
_BENCHES: list = []


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def wait_healthy(max_wait_s: float = 240.0) -> bool:
    """Healthy = sub-ms dispatch AND decent bulk-upload bandwidth.

    A server-side compile churn (e.g. an orphaned Pallas compile from a
    killed process) can leave tiny dispatches fast while 100+ MB uploads
    crawl at <1 MB/s — the dispatch-only probe used to declare healthy and
    then the bench's device_put stalled for 10 minutes."""
    x = jax.device_put(np.arange(131072, dtype=np.uint32))
    f = jax.jit(lambda v: v + jnp.uint32(1))
    probe = np.zeros(16 << 20, np.uint8)
    deadline = time.time() + max_wait_s
    salt = int(time.time_ns() % 1_000_003)
    while True:
        jax.block_until_ready(f(x))
        samples = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            samples.append(time.perf_counter() - t0)
        ms = sorted(samples)[5] * 1e3
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe))
        up_mbps = 16.0 / max(time.perf_counter() - t0, 1e-9)
        # Fresh-compile probe: a unique tiny program. The compile helper
        # queues behind any orphaned big compile, so this is the only probe
        # that predicts whether our real compile will stall.
        salt += 1
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(lambda v: v * jnp.uint32(salt) ^ jnp.uint32(salt // 7))(x))
        compile_s = time.perf_counter() - t0
        if ms < 1.0 and up_mbps > 50.0 and compile_s < 5.0:
            log(f"device healthy (dispatch {ms:.2f} ms, upload {up_mbps:.0f} MB/s, probe-compile {compile_s:.1f}s)")
            return True
        if time.time() >= deadline:
            log(f"device still degraded (dispatch {ms:.2f} ms, upload {up_mbps:.0f} MB/s, probe-compile {compile_s:.1f}s); proceeding")
            return False
        log(f"device degraded (dispatch {ms:.2f} ms, upload {up_mbps:.0f} MB/s, probe-compile {compile_s:.1f}s); waiting 60s...")
        time.sleep(60)


def bench(name, make, work_bytes, unit="GB/s", elements=None, iters=7):
    """Register a lazy bench: ``make()`` -> zero-arg measured fn, or a
    list/tuple of fns cycled per iteration (alternate staged inputs so the
    tunnel server cannot serve a memoized result for a repeated identical
    dispatch — same-input repeats have measured impossible TB/s rates)."""
    _BENCHES.append((name, make, work_bytes, unit, elements, iters))


def _force_readback(out):
    """block_until_ready + a host readback of small leaves: a value that
    reaches host numpy must have been truly computed."""
    jax.block_until_ready(out)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "size") and leaf.size * leaf.dtype.itemsize <= (16 << 20):
            np.asarray(leaf)
    return out


def run_benches():
    compile_only = "--compile-only" in sys.argv
    require_warm = "--require-warm" in sys.argv
    max_wait = 900.0
    if "--max-wait" in sys.argv:
        max_wait = float(sys.argv[sys.argv.index("--max-wait") + 1])
    selected = _BENCHES
    if "--only" in sys.argv:
        want = sys.argv[sys.argv.index("--only") + 1]
        selected = [b for b in _BENCHES if want in b[0]]
    for name, make, work_bytes, unit, elements, iters in selected:
        try:
            t0 = time.perf_counter()
            fns = make()
            if not isinstance(fns, (list, tuple)):
                fns = [fns]
            for fn in fns:
                _force_readback(fn())
            compile_s = time.perf_counter() - t0
            log(f"setup+compile {name} in {compile_s:.1f}s")
            if compile_only:
                continue
            if require_warm:
                # What actually matters is whether this process is now
                # poisoned (a big fresh compile leaves a ~40 ms dispatch
                # floor that never recovers in-process). Probe it directly.
                px = jax.device_put(np.arange(131072, dtype=np.uint32))
                pf = jax.jit(lambda v: v + jnp.uint32(1))
                jax.block_until_ready(pf(px))
                samples = []
                for _ in range(7):
                    t0 = time.perf_counter()
                    jax.block_until_ready(pf(px))
                    samples.append(time.perf_counter() - t0)
                post_ms = sorted(samples)[3] * 1e3
                if post_ms > 1.5:
                    RESULTS[name] = {
                        "cold_compile_s": round(compile_s, 1),
                        "post_dispatch_ms": round(post_ms, 2),
                    }
                    log(
                        f"{name}: COLD (compile {compile_s:.1f}s, post-dispatch "
                        f"{post_ms:.2f} ms); rerun over the warm cache"
                    )
                    continue
                log(f"{name}: warm enough (post-dispatch {post_ms:.2f} ms); measuring")
            if compile_s > 15.0:
                # The server-side compile helper may still be churning
                # (poisoning every dispatch); wait for quiescence.
                wait_healthy(max_wait)
            ts = []
            for i in range(iters):
                t0 = time.perf_counter()
                _force_readback(fns[i % len(fns)]())
                ts.append(time.perf_counter() - t0)
            sec = sorted(ts)[len(ts) // 2]
            value = (elements if elements else work_bytes) / sec / 1e9
            RESULTS[name] = {"value": round(value, 2), "unit": unit, "ms": round(sec * 1e3, 3)}
            log(f"{name}: {value:.2f} {unit} ({sec * 1e3:.2f} ms)")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"{name}: FAILED {e}")
    # Persistent-cache writes can be asynchronous; give them time to flush
    # before the process exits (a COLD verdict exits within milliseconds of
    # the compile finishing — observed lost writes).
    time.sleep(5)


def _flat(n, seed=0):
    return np.random.default_rng(seed).integers(97, 123, n, dtype=np.uint8)


def _lines_layout(B=131072, W=1024, seed=0):
    from stringwars_tpu.ops import hash as H
    from stringwars_tpu.tape import PaddedTokens

    rng = np.random.default_rng(seed)
    toks = PaddedTokens(
        data=jax.device_put(rng.integers(0, 256, (B, W), dtype=np.uint8)),
        lengths=jax.device_put(np.full(B, W - 7, np.int32)),
        width=W,
    )
    return jax.block_until_ready(H.prepare(toks)), B * W


def main():
    wait_healthy()

    def mk_bytesum():
        from stringwars_tpu.ops.bytesum import _bytesum_parts, _chunk_shape

        N = 256 << 20
        rows, chunk = _chunk_shape(N)
        padded = np.zeros(rows * chunk, np.uint8)
        padded[:N] = _flat(N)
        dev = jax.device_put(padded)
        # Vary a tiny salt input per call: defeats the server's
        # same-dispatch result memoization while the 256 MB buffer stays
        # resident (re-uploading it per call measures the tunnel, not
        # the chip).
        f = jax.jit(lambda d, s: jax.tree_util.tree_map(lambda x: x + s, _bytesum_parts(d, N)))
        salts = [jax.device_put(jnp.uint32(v)) for v in (0, 1)]
        return [lambda s=s: f(dev, s) for s in salts]

    bench("bytesum-256MB", mk_bytesum, 256 << 20)

    def mk_find(nbytes, cap):
        from stringwars_tpu.ops import find as F

        n = 128 << 20
        hay = jax.device_put(np.asarray(F._staged(jnp.asarray(_flat(n)), n, cap)))
        needles = [
            F.pack_needle(b"abcdefghabcdefgh"[:nbytes], cap),
            F.pack_needle(b"qzjxkvbwqzjxkvbw"[:nbytes], cap),
        ]
        return [lambda nd=nd: F._count_from_mask(hay, nd, n) for nd in needles]

    bench("find-8B-needle-128MB", lambda: mk_find(8, 4), 128 << 20)
    bench("find-16B-needle-128MB", lambda: mk_find(16, 16), 128 << 20)

    def mk_byteset():
        from stringwars_tpu.ops.find import _byteset_member, pack_byteset

        n = 128 << 20
        hay = jax.device_put(_flat(n))
        # Alternate two (tiny) charset tables; the haystack stays resident.
        f = jax.jit(
            lambda h, t: jnp.sum(_byteset_member(h, t, n).astype(jnp.int32), dtype=jnp.int32)
        )
        tables_ = [
            jax.device_put(pack_byteset(cs)) for cs in (b"0123456789", b"aeiouAEIOU")
        ]
        return [lambda t=t: f(hay, t) for t in tables_]

    bench("byteset-128MB", mk_byteset, 128 << 20)

    def mk_xxh64():
        from stringwars_tpu.ops import hash as H

        f = jax.jit(H.xxh64)
        lays = [_lines_layout(seed=s)[0] for s in (0, 1)]
        return [lambda lay=lay: f(lay) for lay in lays]

    bench("xxh64-1KB-lines-128MB", mk_xxh64, 131072 * 1024)

    def mk_xxh32():
        from stringwars_tpu.ops import hash as H

        f = jax.jit(H.xxh32)
        lays = [_lines_layout(seed=s)[0] for s in (0, 1)]
        return [lambda lay=lay: f(lay) for lay in lays]

    bench("xxh32-1KB-lines-128MB", mk_xxh32, 131072 * 1024)

    def mk_xxh3():
        from stringwars_tpu.ops import xxh3 as X3
        from stringwars_tpu.tape import PaddedTokens

        rng = np.random.default_rng(0)
        B, W = 131072, 1024
        toks = PaddedTokens(
            data=jax.device_put(rng.integers(0, 256, (B, W), dtype=np.uint8)),
            lengths=jax.device_put(np.full(B, W - 7, np.int32)),
            width=W,
        )
        f = jax.jit(X3.xxh3_64, static_argnames=("seed",))
        lays = []
        for seed in (0, 1):
            r2 = np.random.default_rng(seed)
            t2 = PaddedTokens(
                data=jax.device_put(r2.integers(0, 256, (B, W), dtype=np.uint8)),
                lengths=jax.device_put(np.full(B, W - 7, np.int32)),
                width=W,
            )
            lays.append(jax.block_until_ready(X3.prepare3(t2)))
        return [lambda lay=lay: f(lay) for lay in lays]

    bench("xxh3-1KB-lines-128MB", mk_xxh3, 131072 * 1024)

    def mk_xxh64_pallas():
        from stringwars_tpu.ops import hash as H

        f = jax.jit(lambda l: H.xxh64_pallas(l, seed=0, interpret=False))
        lays = [_lines_layout(seed=s)[0] for s in (0, 1)]
        return [lambda lay=lay: f(lay) for lay in lays]

    bench("xxh64-pallas-1KB-128MB", mk_xxh64_pallas, 131072 * 1024)

    def mk_words():
        from stringwars_tpu.ops import hash as H
        from stringwars_tpu.tape import PaddedTokens

        rng = np.random.default_rng(0)
        Bw, Ww = 2_000_000, 64
        toks = PaddedTokens(
            data=jax.device_put(rng.integers(0, 256, (Bw, Ww), dtype=np.uint8)),
            lengths=jax.device_put(rng.integers(1, 16, Bw, dtype=np.int32)),
            width=Ww,
        )
        f = jax.jit(H.xxh64)
        lays = []
        for seed in (0, 1):
            r2 = np.random.default_rng(seed)
            t2 = PaddedTokens(
                data=jax.device_put(r2.integers(0, 256, (Bw, Ww), dtype=np.uint8)),
                lengths=jax.device_put(r2.integers(1, 16, Bw, dtype=np.int32)),
                width=Ww,
            )
            lays.append(jax.block_until_ready(H.prepare(t2)))
        return [lambda lay=lay: f(lay) for lay in lays]

    bench("xxh64-words-128MB", mk_words, 2_000_000 * 64)

    def mk_multiseed():
        from stringwars_tpu.ops import hash as H

        lay, _ = _lines_layout()
        f0 = jax.jit(lambda l: H.xxh64_multiseed(l, np.arange(16, dtype=np.uint64)))
        f1 = jax.jit(lambda l: H.xxh64_multiseed(l, np.arange(1, 17, dtype=np.uint64)))
        return [lambda: f0(lay), lambda: f1(lay)]

    bench("xxh64-multiseed16-1KB", mk_multiseed, 131072 * 1024)

    def mk_lev(affine, Bp=8192, L=256):
        def make():
            from stringwars_tpu.ops import similarity as S

            f = jax.jit(S.nw_score_affine if affine else S.levenshtein)
            fns = []
            for seed in (0, 1):
                rng = np.random.default_rng(seed)
                pairs = S.PairBatch(
                    a=jax.device_put(rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)),
                    b=jax.device_put(rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)),
                    a_len=jax.device_put(np.full(Bp, L, np.int32)),
                    b_len=jax.device_put(np.full(Bp, L, np.int32)),
                )
                fns.append(lambda pairs=pairs: f(pairs))
            return fns

        return make

    cells = 8192 * 256 * 256
    bench("levenshtein-8192x256B", mk_lev(False), cells, unit="GCUPS", elements=cells)
    bench("nw-affine-8192x256B", mk_lev(True), cells, unit="GCUPS", elements=cells)

    def mk_myers(Bp, L):
        def make():
            from stringwars_tpu.ops.myers_pallas import MyersBatch, _myers

            fns = []
            for seed in (0, 1):
                rng = np.random.default_rng(seed)
                a = rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)
                b = rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)
                lens = np.full(Bp, L, np.int32)
                batch = MyersBatch(a, b, lens, lens)
                jax.block_until_ready((batch.bp, batch.b_cols))
                fns.append(
                    lambda batch=batch: _myers(
                        batch.bp,
                        batch.b_cols,
                        batch.blen,
                        batch.lastw,
                        batch.lastr,
                        batch.alen,
                        batch.n_words,
                        batch.nbits,
                        False,
                    )
                )
            return fns

        return make

    mcells = 65536 * 256 * 256
    bench("lev-myers-64kx256B", mk_myers(65536, 256), mcells, unit="GCUPS", elements=mcells)

    def mk_fp():
        from stringwars_tpu.ops.fingerprint import fingerprint
        from stringwars_tpu.tape import PaddedTokens

        docsB, W = 16384, 1024
        f = jax.jit(lambda t: fingerprint(t, ndim=512, with_counts=False))
        fns = []
        for seed in (0, 1):
            rng = np.random.default_rng(seed)
            docs = PaddedTokens(
                data=jax.device_put(rng.integers(0, 256, (docsB, W), dtype=np.uint8)),
                lengths=jax.device_put(np.full(docsB, W - 7, np.int32)),
                width=W,
            )
            fns.append(lambda docs=docs: f(docs))
        return fns

    bench("fingerprint-512d-16MB", mk_fp, 16384 * 1024)

    def mk_lut():
        from stringwars_tpu.ops.memops import lut_translate, invert_case_lut

        dev = jax.device_put(_flat(128 << 20))
        f = jax.jit(lut_translate)
        luts = [
            jnp.asarray(invert_case_lut()),
            jnp.asarray(np.arange(256, dtype=np.uint8)[::-1].copy()),
        ]
        return [lambda lut=lut: f(dev, lut) for lut in luts]

    bench("lut-translate-128MB", mk_lut, 128 << 20)

    def mk_lut_planes():
        from stringwars_tpu.ops.memops import lut_translate_planes, invert_case_lut

        dev = jax.device_put(_flat(128 << 20))
        f = jax.jit(lut_translate_planes)
        luts = [
            jnp.asarray(invert_case_lut()),
            jnp.asarray(np.arange(256, dtype=np.uint8)[::-1].copy()),
        ]
        return [lambda lut=lut: f(dev, lut) for lut in luts]

    bench("lut-planes-128MB", mk_lut_planes, 128 << 20)

    def mk_rand():
        from stringwars_tpu.ops.memops import fill_random_words

        f = jax.jit(fill_random_words, static_argnames=("n",))
        seeds = [jax.device_put(jnp.uint32(s)) for s in (7, 1009)]
        return [lambda s=s: f(s, 128 << 20) for s in seeds]

    bench("fill-random-128MB", mk_rand, 128 << 20)

    def mk_ac():
        from stringwars_tpu.ops.ahocorasick import Automaton, ac_count

        a2 = Automaton([b"the", b"and", b"tion", b"ab"])
        hay_small = _flat(16 << 20)
        return lambda: jnp.asarray(ac_count(a2, hay_small, chunk=1024, use_mxu=False))

    bench("ac-scan-16MB", mk_ac, 16 << 20)

    def mk_ac_mxu(mb=64):
        def make():
            from stringwars_tpu.ops.ahocorasick import Automaton, ac_count_staged, stage_rows

            n = mb << 20
            hay = _flat(n)
            # Two automata of identical max_len alternate over one staged
            # haystack (tiny tables vary per call; the 64 MB rows stay
            # resident — same memoization-defeat as the other benches).
            autos = [
                Automaton([b"the", b"and", b"tion", b"abcd"]),
                Automaton([b"quiz", b"ber", b"ion", b"za"]),
            ]
            rows_dev, gpos0, chunk = stage_rows(hay, n, 4, None, True)
            jax.block_until_ready(rows_dev)
            return [
                lambda a=a: ac_count_staged(a, rows_dev, gpos0, n, chunk, True)
                for a in autos
            ]

        return make

    bench("ac-mxu-64MB", mk_ac_mxu(), 64 << 20)

    def mk_chacha():
        from stringwars_tpu.ops.chacha import _xor_keystream_u32, _key_words

        n = 128 << 20
        data_u32 = jax.device_put(_flat(n).view("<u4"))
        key8 = _key_words(bytes(range(32)))
        nonce3 = jnp.asarray(np.frombuffer(bytes(12), "<u4"))
        counters = [jax.device_put(jnp.uint32(c)) for c in (1, 777_000_001)]
        return [
            lambda c=c: _xor_keystream_u32(data_u32, key8, nonce3, c, n // 64)
            for c in counters
        ]

    bench("chacha20-xor-128MB", mk_chacha, 128 << 20)

    def mk_find_pallas(nbytes, cap):
        def make():
            from stringwars_tpu.ops.find_pallas import StagedHaystack, find_count_pallas
            from stringwars_tpu.ops.find import pack_needle

            n = 128 << 20
            staged = StagedHaystack(_flat(n))
            needles = [
                pack_needle(b"abcdefghabcdefgh"[:nbytes], cap),
                pack_needle(b"qzjxkvbwqzjxkvbw"[:nbytes], cap),
            ]
            return [
                lambda nd=nd: jnp.asarray(find_count_pallas(staged, nd, interpret=False))
                for nd in needles
            ]

        return make

    bench("find-pallas-8B-128MB", mk_find_pallas(8, 4), 128 << 20)
    bench("find-pallas-16B-128MB", mk_find_pallas(16, 16), 128 << 20)

    def mk_find_cycle(nbytes, cap, n_needles=64):
        def make():
            from stringwars_tpu.ops.find import pack_needle
            from stringwars_tpu.ops.find_pallas import (
                NeedleBatch,
                StagedHaystack,
                find_count_cycle,
            )

            n = 128 << 20
            staged = StagedHaystack(_flat(n))
            fns = []
            for seed in (3, 4):
                rng = np.random.default_rng(seed)
                needles = [
                    pack_needle(rng.integers(97, 123, nbytes, dtype=np.uint8).tobytes(), cap)
                    for _ in range(n_needles)
                ]
                batch = NeedleBatch(staged, needles)
                fns.append(lambda batch=batch: find_count_cycle(staged, batch, interpret=False))
            return fns

        return make

    bench("find-cycle64-8B-128MB", mk_find_cycle(8, 4), 64 * (128 << 20))
    bench("find-cycle64-16B-128MB", mk_find_cycle(16, 16), 64 * (128 << 20))

    def mk_find_conv(nbytes, cap):
        def make():
            from stringwars_tpu.ops import find as F

            n = 128 << 20
            hay = jax.device_put(np.asarray(F._staged(jnp.asarray(_flat(n)), n, cap)))
            max_m = 4 * cap - 3
            needles = [
                F.pack_needle(b"abcdefghabcdefgh"[:nbytes], cap),
                F.pack_needle(b"qzjxkvbwqzjxkvbw"[:nbytes], cap),
            ]
            return [
                lambda nd=nd: F._match_mask_conv(hay, nd, n, max_m).sum() for nd in needles
            ]

        return make

    bench("find-conv-8B-128MB", mk_find_conv(8, 4), 128 << 20)
    bench("find-conv-16B-128MB", mk_find_conv(16, 16), 128 << 20)

    def mk_swh64():
        from stringwars_tpu.ops import hash as H

        lay, _ = _lines_layout()
        # The seed is a real (tiny) varying input: two seeds alternate so
        # the layout buffers stay resident but no dispatch repeats.
        f = jax.jit(H.swh64)
        seeds = [jax.device_put(jnp.uint32(s)) for s in (0, 7)]
        return [lambda s=s: f(lay, s) for s in seeds]

    bench("swh64-1KB-lines-128MB", mk_swh64, 131072 * 1024)

    def mk_swh64_multiseed():
        from stringwars_tpu.ops import hash as H

        lay, _ = _lines_layout()
        f0 = jax.jit(lambda l: H.swh64_multiseed(l, np.arange(16, dtype=np.uint64)))
        f1 = jax.jit(lambda l: H.swh64_multiseed(l, np.arange(1, 17, dtype=np.uint64)))
        return [lambda: f0(lay), lambda: f1(lay)]

    bench("swh64-multiseed16-1KB", mk_swh64_multiseed, 131072 * 1024)

    def mk_argsort():
        from stringwars_tpu.ops.sort import _byte_columns, _lsd_argsort

        B, W = 1 << 21, 15  # 2M short words, 5 packed columns
        fns = []
        for seed in (0, 1):
            rng = np.random.default_rng(seed)
            data = rng.integers(97, 123, (B, W), dtype=np.uint8)
            lengths = rng.integers(3, W + 1, B, dtype=np.int32)
            cols = jax.block_until_ready(
                _byte_columns(jnp.asarray(data), jnp.asarray(lengths))
            )
            fns.append(lambda cols=cols: _lsd_argsort(cols))
        return fns

    n_cmp = (1 << 21) * 21  # n*log2(n) comparisons (sequence/bench.rs:79)
    bench("argsort-2M-words", mk_argsort, (1 << 21) * 15, unit="Gcmp/s", elements=n_cmp)

    def mk_sha256():
        from stringwars_tpu.ops.sha256 import prepare_sha256, sha256
        from stringwars_tpu.tape import PaddedTokens

        f = jax.jit(sha256)
        fns = []
        for seed in (0, 1):
            rng = np.random.default_rng(seed)
            B, W = 131072, 1024
            toks = PaddedTokens(
                data=rng.integers(0, 256, (B, W), dtype=np.uint8),
                lengths=np.full(B, W - 9, np.int32),
                width=W,
            )
            lay = jax.block_until_ready(prepare_sha256(toks))
            fns.append(lambda lay=lay: f(lay))
        return fns

    bench("sha256-1KB-lines-128MB", mk_sha256, 131072 * 1024)

    _bpe_B, _bpe_W = 1 << 20, 16
    _bpe_lengths = np.random.default_rng(1234).integers(2, 17, _bpe_B).astype(np.int32)

    def mk_bpe():
        from stringwars_tpu.ops.bpe import MergeTable, bpe_encode, train_merges
        from stringwars_tpu.tape import PaddedTokens

        # Skewed synthetic words so merges actually fire.
        alphabet = np.frombuffer(b"etaoinshrdlucmfwyp", np.uint8)
        rng = np.random.default_rng(0)
        data = alphabet[rng.integers(0, len(alphabet), (_bpe_B, _bpe_W))]
        sample = [data[i, : _bpe_lengths[i]].tobytes() for i in range(20_000)]
        table = MergeTable.from_merges(train_merges(sample, 256))
        f = jax.jit(lambda t: bpe_encode(t, table))
        fns = []
        for seed in (0, 1):
            r2 = np.random.default_rng(seed + 10)
            d = alphabet[r2.integers(0, len(alphabet), (_bpe_B, _bpe_W))]
            toks = PaddedTokens(
                data=jax.device_put(d),
                lengths=jax.device_put(_bpe_lengths),
                width=_bpe_W,
            )
            jax.block_until_ready(toks.data)
            fns.append(lambda toks=toks: f(toks))
        return fns

    bench("bpe-1M-words", mk_bpe, int(_bpe_lengths.sum()))

    run_benches()
    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
