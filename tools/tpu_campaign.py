#!/usr/bin/env python
"""Measure kernel families on the real TPU chip; JSON results to stdout.

Measurement protocol (v3, "chained loop"), learned the hard way on the
tunneled device:

* The tunnel serves MEMOIZED results for a repeated identical dispatch —
  single-kernel timing loops over fixed inputs have measured impossible
  above-roofline TB/s rates.  Defense: every measured call is ONE dispatch
  of a ``lax.fori_loop`` whose k iterations are DATA-DEPENDENT — a u32
  ``salt`` carried through the loop perturbs a tiny input of every
  iteration and folds the kernel output back into the carry, so no
  iteration can be skipped, hoisted, or served from a cache; across calls
  the evolving salt feeds forward so no two dispatches ever repeat.
* After any heavy compile the in-process dispatch floor degrades to
  ~30-40 ms and never recovers.  Defense: the loop makes the dispatch
  overhead a constant; timing the SAME program at two trip counts
  (k and k+K) and dividing the difference by K cancels it exactly, so a
  kernel can compile and measure in one process — no retry dance.
* First compiles are server-side and can take minutes.  Defense: the
  persistent compile cache (``~/.cache/swtpu-xla`` — the SAME directory
  ``stringwars_tpu/__init__`` configures, so suite runs, tests and the
  campaign all share one cache) makes them one-time per program.

The reference's measurement loop analog is ``utils.rs:716-799``
(warm-up, then a deadline-paced hot loop); here the warm-up is the
compile+k=1 call and the hot loop is the in-device fori_loop.
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

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/swtpu-xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_debug_log_modules", "jax._src.compilation_cache,jax._src.compiler")

RESULTS: dict[str, dict] = {}
_BENCHES: list = []


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def wait_healthy(max_wait_s: float = 240.0) -> bool:
    """Healthy = sub-ms dispatch AND decent bulk-upload bandwidth AND a
    fresh tiny compile under 5 s (the compile helper queues behind any
    orphaned big compile)."""
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


def bench(name, make, work_bytes, unit="GB/s", elements=None):
    """Register a chained bench.

    ``make() -> (body, consts, extra0)`` where
    ``body(salt: u32[], extra, *consts) -> (salt', extra')`` runs ONE
    kernel application whose inputs depend on ``salt`` (a tiny
    perturbation — a seed, a counter, XORed needle bytes) and whose
    output folds back into ``salt'``.  ``extra0`` is an optional
    loop-carried pytree for buffer-chained kernels (LUT, stream ciphers)
    — pass ``()`` otherwise.  ``consts`` are loop-invariant device
    buffers, passed as jit ARGUMENTS (never closure constants) so the
    program and its cache key are data-independent.
    """
    _BENCHES.append((name, make, work_bytes, unit, elements))


_TARGET_EXTRA_S = 0.5  # wanted (t_{1+K} - t_1): well above tunnel jitter


def _measure_chained(name, body, consts, extra0, work):
    # The protocol core now lives in the suite harness (utils/harness.py,
    # chained_per_iter) — the campaign is a thin registry + logging shell.
    from stringwars_tpu.utils.harness import chained_per_iter

    compile_only = "--compile-only" in sys.argv
    diag = chained_per_iter(
        body,
        consts,
        extra0,
        target_extra_s=_TARGET_EXTRA_S,
        smoke=compile_only,
        log=lambda msg: log(f"{name}: {msg}"),
    )
    if compile_only:
        RESULTS[name] = {"compile_s": round(diag["compile_s"], 1)}
        return
    per_iter = diag["per_iter_s"]
    value = work / per_iter / 1e9
    RESULTS[name] = {
        "value": round(value, 2),
        "unit": _current_unit,
        "ms": round(per_iter * 1e3, 3),
        "k": diag["k"],
        "compile_s": round(diag["compile_s"], 1),
    }
    log(f"{name}: {value:.2f} {_current_unit} ({per_iter * 1e3:.3f} ms/iter over k={diag['k']})")


_current_unit = "GB/s"


def run_benches():
    global _current_unit
    max_wait = 240.0
    if "--max-wait" in sys.argv:
        max_wait = float(sys.argv[sys.argv.index("--max-wait") + 1])
    selected = _BENCHES
    if "--only" in sys.argv:
        wants = sys.argv[sys.argv.index("--only") + 1].split(",")
        selected = [b for b in _BENCHES if any(w in b[0] for w in wants)]
    wait_healthy(max_wait)
    for name, make, work_bytes, unit, elements in selected:
        _current_unit = unit
        try:
            body, consts, extra0 = make()
            _measure_chained(name, body, consts, extra0, elements if elements else work_bytes)
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": _clean_error(f"{type(e).__name__}: {e}")}
            log(f"{name}: FAILED {type(e).__name__}: {e}")
        _checkpoint()
    time.sleep(3)  # let async persistent-cache writes flush


def _clean_error(msg: str) -> str:
    """First line of an error, ANSI-stripped — the committed campaign
    JSONs are evidence, not raw server log dumps."""
    import re

    first = msg.splitlines()[0] if msg else msg
    return re.sub(r"\x1b\[[0-9;]*m", "", first)[:300]


def _checkpoint():
    # Survive tunnel outages: every completed row lands on disk immediately.
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "campaign_live.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(RESULTS, f, indent=1)
    os.replace(tmp, path)


def _flat(n, seed=0):
    return np.random.default_rng(seed).integers(97, 123, n, dtype=np.uint8)


# Salt folding / perturbation helpers are shared with the suite harness.
from stringwars_tpu.utils.harness import fold_salt as _fold  # noqa: E402
from stringwars_tpu.utils.harness import perturb_u8 as _pert_u8  # noqa: E402


def _lines_tokens(B=131072, W=1024, seed=0):
    from stringwars_tpu.tape import PaddedTokens

    rng = np.random.default_rng(seed)
    return PaddedTokens(
        data=jax.device_put(rng.integers(0, 256, (B, W), dtype=np.uint8)),
        lengths=jax.device_put(np.full(B, W - 9, np.int32)),
        width=W,
    )


def main():
    def mk_bytesum():
        # Production path: single-pass Pallas accumulator (one HBM read).
        from stringwars_tpu.ops.bytesum import _PL_LANES, _PL_SUB, _bytesum_words_pallas

        N = 256 << 20
        blk = _PL_SUB * _PL_LANES
        n_words = -(-(N // 4) // blk) * blk
        padded = np.zeros(n_words * 4, np.uint8)
        padded[:N] = _flat(N)
        dev = jax.device_put(np.ascontiguousarray(padded.view("<u4")))

        def body(s, e, words):
            # Salt applied IN-kernel: the chained perturbation must not
            # add an extra XLA materialization pass to a 1-pass probe.
            hi, lo = _bytesum_words_pallas(words, N, False, salt=s)
            return _fold(s, hi, lo), e

        return body, (dev,), ()

    bench("bytesum-256MB", mk_bytesum, 256 << 20)

    def mk_bytesum_xla():
        # Diagnostic: the fused-XLA word reduce (multi-pass tree; the
        # round-2/3 record path) — kept to quantify the single-pass win.
        from stringwars_tpu.ops.bytesum import _bytesum_words_parts, _word_chunk_shape

        N = 256 << 20
        rows, chunk = _word_chunk_shape(N // 4)
        padded = np.zeros(rows * chunk * 4, np.uint8)
        padded[:N] = _flat(N)
        dev = jax.device_put(np.ascontiguousarray(padded.view("<u4")))

        def body(s, e, words):
            hi, lo = _bytesum_words_parts(words ^ s, N)
            return _fold(s, hi, lo), e

        return body, (dev,), ()

    bench("bytesum-xla-256MB", mk_bytesum_xla, 256 << 20)

    def mk_byteset():
        from stringwars_tpu.ops.find import _byteset_member, pack_byteset

        n = 128 << 20
        hay = jax.device_put(_flat(n))
        tables = jnp.stack(
            [pack_byteset(cs) for cs in (b"0123456789", b"aeiouAEIOU", b"\n\r\v\f", b"</>&'\"=[]")]
        )

        def body(s, e, hay_, tabs):
            t = jax.lax.dynamic_index_in_dim(tabs, (s % jnp.uint32(4)).astype(jnp.int32), 0, keepdims=False)
            t = t ^ s  # full-entropy: membership bitmap contents vary per call
            cnt = jnp.sum(_byteset_member(hay_, t, n).astype(jnp.int32), dtype=jnp.int32)
            return _fold(s, cnt), e

        return body, (hay, tables), ()

    bench("byteset-128MB", mk_byteset, 128 << 20)

    def mk_swh64():
        from stringwars_tpu.ops import hash as H

        lay = jax.block_until_ready(H.prepare(_lines_tokens()))

        def body(s, e, words_t, tail_t, lengths):
            h = H.swh64(H.HashLayout(words_t, tail_t, lengths), s)
            return _fold(s, h.hi, h.lo), e

        return body, (lay.words_t, lay.tail_t, lay.lengths), ()

    bench("swh64-1KB-lines-128MB", mk_swh64, 131072 * 1024)

    def mk_swh64_multiseed():
        from stringwars_tpu.ops import hash as H

        lay = jax.block_until_ready(H.prepare(_lines_tokens()))
        seeds = np.arange(16, dtype=np.uint64)

        def body(s, e, words_t, tail_t, lengths):
            h = H.swh64_multiseed(H.HashLayout(words_t ^ s, tail_t, lengths), seeds)
            return _fold(s, h.hi, h.lo), e

        return body, (lay.words_t, lay.tail_t, lay.lengths), ()

    bench("swh64-multiseed16-1KB", mk_swh64_multiseed, 131072 * 1024)

    def mk_swh64_multiseed_words():
        # Reference multihash workload shape: short words, 1024-bit digests,
        # metric = digest Gbit/s (containers/bench.rs:50-67, 71.85 Gbit/s sz).
        from stringwars_tpu.ops import hash as H
        from stringwars_tpu.tape import PaddedTokens

        B, W = 1 << 21, 16
        rng = np.random.default_rng(0)
        toks = PaddedTokens(
            data=jax.device_put(rng.integers(97, 123, (B, W), dtype=np.uint8)),
            lengths=jax.device_put(rng.integers(3, 17, B, dtype=np.int32)),
            width=W,
        )
        lay = jax.block_until_ready(H.prepare(toks))
        seeds = np.arange(16, dtype=np.uint64)

        def body(s, e, words_t, tail_t, lengths):
            h = H.swh64_multiseed(H.HashLayout(words_t ^ s, tail_t, lengths), seeds)
            return _fold(s, h.hi, h.lo), e

        return body, (lay.words_t, lay.tail_t, lay.lengths), ()

    bench(
        "swh64-multiseed16-words",
        mk_swh64_multiseed_words,
        (1 << 21) * 16,
        unit="Gbit/s",
        elements=(1 << 21) * 1024,  # digest bits per iteration
    )

    def mk_xxh64():
        from stringwars_tpu.ops import hash as H

        lay = jax.block_until_ready(H.prepare(_lines_tokens()))

        def body(s, e, words_t, tail_t, lengths):
            h = H.xxh64(H.HashLayout(words_t ^ s, tail_t, lengths))
            return _fold(s, h.hi, h.lo), e

        return body, (lay.words_t, lay.tail_t, lay.lengths), ()

    bench("xxh64-1KB-lines-128MB", mk_xxh64, 131072 * 1024)

    def mk_xxh3():
        from stringwars_tpu.ops import xxh3 as X3

        lay = jax.block_until_ready(X3.prepare3(_lines_tokens()))

        def body(s, e, words_t, last64_t, lengths):
            h = X3.xxh3_64(X3.XXH3Layout(words_t ^ s, last64_t, lengths))
            return _fold(s, h.hi, h.lo), e

        return body, (lay.words_t, lay.last64_t, lay.lengths), ()

    bench("xxh3-1KB-lines-128MB", mk_xxh3, 131072 * 1024)

    def mk_find_cycle(nbytes, cap, n_needles=64):
        def make():
            from stringwars_tpu.ops.find import pack_needle
            from stringwars_tpu.ops.find_pallas import NeedleBatch, StagedHaystack, _count_batch

            n = 128 << 20
            staged = StagedHaystack(_flat(n))
            rng = np.random.default_rng(3)
            needles = [
                pack_needle(rng.integers(97, 123, nbytes, dtype=np.uint8).tobytes(), cap)
                for _ in range(n_needles)
            ]
            batch = NeedleBatch(staged, needles)
            k_words = batch.k_words

            def body(s, e, rows, words4, masks4, meta):
                spread = jax.lax.bitcast_convert_type(s * jnp.uint32(0x9E3779B1), jnp.int32)
                counts = _count_batch(rows, words4 ^ spread, masks4, meta, k_words, False)
                return _fold(s, counts), e

            return body, (staged.rows, batch.words4, batch.masks4, batch.meta), ()

        return make

    bench("find-cycle64-8B-128MB", mk_find_cycle(8, 4), 64 * (128 << 20))
    bench("find-cycle64-16B-128MB", mk_find_cycle(16, 8), 64 * (128 << 20))

    def mk_lut():
        from stringwars_tpu.ops.memops import invert_case_lut, lut_translate

        dev = jax.device_put(_flat(128 << 20))
        luts = jnp.stack(
            [
                jnp.asarray(invert_case_lut()),
                jnp.asarray(np.arange(256, dtype=np.uint8)[::-1].copy()),
            ]
        )

        def body(s, buf, tabs):
            t = jax.lax.dynamic_index_in_dim(tabs, (s % jnp.uint32(2)).astype(jnp.int32), 0, keepdims=False)
            out = lut_translate(buf, t)
            return s + jnp.uint32(1), out

        return body, (luts,), dev

    bench("lut-translate-128MB", mk_lut, 128 << 20)

    def mk_lut_planes():
        from stringwars_tpu.ops.memops import invert_case_lut, lut_translate_planes

        dev = jax.device_put(_flat(128 << 20))
        luts = jnp.stack(
            [
                jnp.asarray(invert_case_lut()),
                jnp.asarray(np.arange(256, dtype=np.uint8)[::-1].copy()),
            ]
        )

        def body(s, buf, tabs):
            t = jax.lax.dynamic_index_in_dim(tabs, (s % jnp.uint32(2)).astype(jnp.int32), 0, keepdims=False)
            out = lut_translate_planes(buf, t)
            return s + jnp.uint32(1), out

        return body, (luts,), dev

    bench("lut-planes-128MB", mk_lut_planes, 128 << 20)

    def mk_lut_fixed():
        # Diagnostic: static table (no per-iteration dynamic pick), buffer
        # still chained — isolates whether the dynamic table operand is
        # what de-vectorizes the 256-gather.
        from stringwars_tpu.ops.memops import invert_case_lut, lut_translate

        dev = jax.device_put(_flat(128 << 20))
        lut = jnp.asarray(invert_case_lut())

        def body(s, buf, t):
            out = lut_translate(buf, t)
            return s + jnp.uint32(1), out

        return body, (lut,), dev

    bench("lut-take-fixed-128MB", mk_lut_fixed, 128 << 20)

    def mk_rand():
        from stringwars_tpu.ops.memops import fill_random_words

        n = 128 << 20

        def body(s, e):
            out = fill_random_words(s, n)
            pick = (s % jnp.uint32(out.shape[0] - 1)).astype(jnp.int32)
            return _fold(s, jax.lax.dynamic_slice(out, (pick,), (1,))), e

        return body, (), ()

    bench("fill-random-128MB", mk_rand, 128 << 20)

    def mk_chacha():
        from stringwars_tpu.ops.chacha import _key_words, _xor_keystream_u32

        n = 128 << 20
        data_u32 = jax.device_put(np.ascontiguousarray(_flat(n).view("<u4")))
        key8 = _key_words(bytes(range(32)))
        nonce3 = jnp.asarray(np.frombuffer(bytes(12), "<u4"))

        def body(s, buf, key, nonce):
            out = _xor_keystream_u32(buf, key, nonce, s, n // 64, use_pallas=True)
            return s * jnp.uint32(7) + jnp.uint32(3), out

        return body, (key8, nonce3), data_u32

    bench("chacha20-xor-128MB", mk_chacha, 128 << 20)

    def mk_fp():
        from stringwars_tpu.ops.fingerprint import fingerprint
        from stringwars_tpu.tape import PaddedTokens

        docsB, W = 16384, 1024
        rng = np.random.default_rng(0)
        data = jax.device_put(rng.integers(0, 256, (docsB, W), dtype=np.uint8))
        lengths = jax.device_put(np.full(docsB, W - 7, np.int32))

        def body(s, e, d, ln):
            toks = PaddedTokens(data=d ^ _pert_u8(s), lengths=ln, width=W)
            out = fingerprint(toks, ndim=512, with_counts=False)
            return _fold(s, out), e

        return body, (data, lengths), ()

    bench("fingerprint-512d-16MB", mk_fp, 16384 * 1024)

    def mk_ac_mxu(mb=64):
        def make():
            from stringwars_tpu.ops.ahocorasick import Automaton, _ac_scan_mxu, stage_rows

            n = mb << 20
            auto = Automaton([b"the", b"and", b"tion", b"abcd"])
            rows_dev, gpos0, chunk = stage_rows(_flat(n), n, 4, None, True)

            def body(s, e, delta_t, out_f, rows, g0):
                cnt = _ac_scan_mxu(delta_t, out_f, rows ^ _pert_u8(s), g0, n, chunk)
                return _fold(s, cnt), e

            return body, (auto.delta_t, auto.out_count_f, rows_dev, gpos0), ()

        return make

    bench("ac-mxu-64MB", mk_ac_mxu(), 64 << 20)

    def mk_argsort():
        from stringwars_tpu.ops.sort import _byte_columns, _lsd_argsort

        B, W = 1 << 21, 15
        rng = np.random.default_rng(0)
        data = rng.integers(97, 123, (B, W), dtype=np.uint8)
        lengths = rng.integers(3, W + 1, B, dtype=np.int32)
        cols = jax.block_until_ready(_byte_columns(jnp.asarray(data), jnp.asarray(lengths)))

        def body(s, e, c):
            perm = _lsd_argsort(c ^ s)
            probe = jax.lax.dynamic_slice(perm, ((s % jnp.uint32(B - 4096)).astype(jnp.int32),), (4096,))
            return _fold(s, probe), e

        return body, (cols,), ()

    n_cmp = (1 << 21) * 21  # n*log2(n) comparisons (sequence/bench.rs:79)
    bench("argsort-2M-words", mk_argsort, (1 << 21) * 15, unit="Gcmp/s", elements=n_cmp)

    def mk_sha256():
        from stringwars_tpu.ops.sha256 import Sha256Layout, prepare_sha256, sha256

        lay = prepare_sha256(_lines_tokens())
        words = jax.device_put(lay.words)
        n_blocks = jax.device_put(lay.n_blocks)

        def body(s, e, w, nb):
            dig = sha256(Sha256Layout(w ^ s, nb))
            return _fold(s, dig), e

        return body, (words, n_blocks), ()

    bench("sha256-1KB-lines-128MB", mk_sha256, 131072 * 1024)

    def mk_lev(affine, Bp=8192, L=256):
        def make():
            from stringwars_tpu.ops import similarity as S

            rng = np.random.default_rng(0)
            a = jax.device_put(rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32))
            b = jax.device_put(rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32))
            lens = jax.device_put(np.full(Bp, L, np.int32))
            fn = S.nw_score_affine if affine else S.levenshtein

            def body(s, e, a_, b_, ln):
                pairs = S.PairBatch(
                    a=(a_ + (s & jnp.uint32(255)).astype(jnp.int32)) & jnp.int32(255),
                    b=b_, a_len=ln, b_len=ln,
                )
                d = fn(pairs)
                return _fold(s, d), e

            return body, (a, b, lens), ()

        return make

    cells = 8192 * 256 * 256
    bench("levenshtein-8192x256B", mk_lev(False), cells, unit="GCUPS", elements=cells)
    bench("nw-affine-8192x256B", mk_lev(True), cells, unit="GCUPS", elements=cells)
    cells32 = 32768 * 256 * 256
    bench("nw-affine-32kx256B", mk_lev(True, Bp=32768), cells32, unit="GCUPS", elements=cells32)

    def mk_myers(Bp=65536, L=256):
        def make():
            from stringwars_tpu.ops.myers_pallas import MyersBatch, _myers

            rng = np.random.default_rng(0)
            a = rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)
            b = rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)
            lens = np.full(Bp, L, np.int32)
            batch = MyersBatch(a, b, lens, lens)
            n_words, nbits = batch.n_words, batch.nbits

            def body(s, e, bp, b_cols, blen, lastw, lastr, alen):
                d = _myers(
                    bp ^ s, b_cols, blen, lastw, lastr, alen, n_words, nbits, False,
                    last_word=batch.last_word,
                )
                return _fold(s, d), e

            return body, (batch.bp, batch.b_cols, batch.blen, batch.lastw, batch.lastr, batch.alen), ()

        return make

    mcells = 65536 * 256 * 256
    bench("lev-myers-64kx256B", mk_myers(), mcells, unit="GCUPS", elements=mcells)

    def mk_gotoh(Bp=65536, L=256, local=False, linear=False):
        def make():
            from stringwars_tpu.ops.affine_pallas import AffineBatch, _affine

            rng = np.random.default_rng(0)
            a = rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)
            b = rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)
            lens = np.full(Bp, L, np.int32)
            batch = AffineBatch(a, b, lens, lens)
            go, ge = (-2, -2) if linear else (-5, -1)

            def body(s, e, ac, rb, alen, blen):
                pert = (s & jnp.uint32(255)).astype(ac.dtype)
                ac2 = jnp.where(ac >= 0, ac ^ pert, ac)
                out = _affine(ac2, rb, alen, blen, batch.A, batch.L, 2, -1, go, ge, local, False,
                              uniform_full=batch.uniform_full)
                return _fold(s, out), e

            return body, (batch.a_chars, batch.rb_pad, batch.alen, batch.blen), ()

        return make

    acells = 65536 * 256 * 256
    bench("nw-affine-pallas-64kx256B", mk_gotoh(), acells, unit="GCUPS", elements=acells)
    bench("sw-affine-pallas-64kx256B", mk_gotoh(local=True), acells, unit="GCUPS", elements=acells)
    bench("nw-linear-pallas-64kx256B", mk_gotoh(linear=True), acells, unit="GCUPS", elements=acells)
    # pack16 (two-cells-per-lane i16 DP) was deleted outright: an op
    # probe shows this v5e toolchain legalizes ONLY add/sub on int16
    # vectors (no maxsi/cmpi/shift/mul), so a 16-bit DP max is
    # inexpressible. See ops/affine_pallas.py.

    def mk_bpe():
        from stringwars_tpu.ops.bpe import MergeTable, train_merges
        from stringwars_tpu.ops.bpe_pallas import bpe_encode_fused as bpe_encode
        from stringwars_tpu.tape import PaddedTokens

        B, W = 1 << 20, 16
        alphabet = np.frombuffer(b"etaoinshrdlucmfwyp", np.uint8)
        rng = np.random.default_rng(0)
        data = alphabet[rng.integers(0, len(alphabet), (B, W))]
        lengths = np.random.default_rng(1234).integers(2, 17, B).astype(np.int32)
        sample = [data[i, : lengths[i]].tobytes() for i in range(20_000)]
        table = MergeTable.from_merges(train_merges(sample, 256))
        # Length-sorted staging: a fused-kernel tile runs until its WORST
        # row quiesces, so grouping rows of similar merge depth lets
        # short-word tiles exit after 1-2 iterations (same multiset of
        # words; batch order is the encoder's to choose).
        order = np.argsort(lengths, kind="stable")
        data, lengths = data[order], lengths[order]
        d_dev = jax.device_put(data)
        l_dev = jax.device_put(lengths)
        total = int(lengths.sum())

        def body(s, e, d, ln):
            # Merge-preserving perturbation: XORing byte values would break
            # every trained pair (the encode loop would early-exit in ~1
            # iteration and inflate throughput); rolling whole rows keeps
            # each token intact so the greedy merge workload is the real one
            # while the dispatch still varies with full salt entropy.
            shift = (s % jnp.uint32(d.shape[0])).astype(jnp.int32)
            toks = PaddedTokens(
                data=jnp.roll(d, shift, axis=0), lengths=jnp.roll(ln, shift), width=W
            )
            ids, counts = bpe_encode(toks, table)
            return _fold(s, ids, counts), e

        return body, (d_dev, l_dev), total

    # work_bytes for BPE = actual summed token bytes; resolved in make, so
    # registered with a callable-aware shim below.
    def mk_bpe_reg():
        body, consts, total = mk_bpe()
        return body, consts, ()

    # register with a nominal byte count (mean of the 2..16 length dist).
    bench("bpe-1M-words", mk_bpe_reg, (1 << 20) * 9)

    def mk_utf8_count():
        from stringwars_tpu.ops.utf8 import utf8_count

        n = 128 << 20
        dev = jax.device_put(_flat(n))

        def body(s, e, d):
            cnt = utf8_count(d ^ _pert_u8(s), n)
            return _fold(s, cnt), e

        return body, (dev,), ()

    bench("utf8-count-128MB", mk_utf8_count, 128 << 20)

    def mk_casefold():
        from stringwars_tpu.ops.casefold import fold_tokens
        from stringwars_tpu.tape import PaddedTokens

        B, W = 131072, 256
        rng = np.random.default_rng(0)
        data = jax.device_put(rng.integers(0, 128, (B, W), dtype=np.uint8))
        lengths = jax.device_put(np.full(B, W, np.int32))

        def body(s, e, d, ln):
            toks = PaddedTokens(data=d ^ _pert_u8(s), lengths=ln, width=W)
            out, counts = fold_tokens(toks)
            # out[:, :4] keeps the expansion scatter live (scatters are not
            # sliced through); counts pins the decode+fold chain.
            return _fold(s, counts, out[:, :4]), e

        return body, (data, lengths), ()

    bench("casefold-tokens-32MB", mk_casefold, 131072 * 256)

    def mk_casefold_ascii():
        from stringwars_tpu.ops.casefold import fold_tokens_ascii
        from stringwars_tpu.tape import PaddedTokens

        B, W = 131072, 1024
        rng = np.random.default_rng(0)
        data = jax.device_put(rng.integers(32, 127, (B, W), dtype=np.uint8))
        lengths = jax.device_put(np.full(B, W, np.int32))

        def body(s, e, d, ln):
            toks = PaddedTokens(data=d ^ _pert_u8(s), lengths=ln, width=W)
            out, counts = fold_tokens_ascii(toks)
            # Sum the WHOLE output: the fold is elementwise, so a static
            # slice would let XLA compute only the sliced columns; the
            # full reduce fuses into the same single pass over the data.
            return _fold(s, counts, jnp.sum(out.astype(jnp.uint32))), e

        return body, (data, lengths), ()

    bench("casefold-ascii-128MB", mk_casefold_ascii, 131072 * 1024)

    def mk_uncased_find():
        # General (any-script) form: staged codepoint-window Pallas kernel,
        # one HBM pass over the i32 folded stream (the XLA window compare
        # it replaced paid m unfused shifted slices: 7.9 GB/s).
        from stringwars_tpu.ops.casefold import fold_bytes
        from stringwars_tpu.ops.find_pallas import cp_window_count, stage_cp_rows

        n = 128 << 20
        folded, count = fold_bytes(_flat(n))
        nfold = int(count)
        rows, chunk = stage_cp_rows(np.asarray(folded)[:nfold], nfold)
        meta = jnp.asarray([nfold, chunk], jnp.int32)
        m = 8

        def body(s, e, rows_d, mt):
            # Derive the 8-cp needle from the salt (full entropy, stays in
            # the lowercase range the corpus folds into).
            idx = jnp.arange(m, dtype=jnp.uint32)
            needle_cp = (97 + ((s >> idx) + idx * s) % jnp.uint32(26)).astype(jnp.int32)
            cnt = cp_window_count(rows_d, needle_cp, mt, m, False)
            return _fold(s, cnt), e

        return body, (jnp.asarray(rows), meta), ()

    bench("uncased-find-8cp-128MB", mk_uncased_find, 128 << 20)

    def mk_uncased_find_ascii():
        # ASCII-folding fast path: folded stream repacked to bytes rides
        # the packed-word find panel; 64 folded needles per dispatch.
        from stringwars_tpu.ops.casefold import fold_bytes
        from stringwars_tpu.ops.find import pack_needle
        from stringwars_tpu.ops.find_pallas import NeedleBatch, StagedHaystack, _count_batch

        n = 128 << 20
        folded, count = fold_bytes(_flat(n))
        staged = StagedHaystack(np.asarray(folded)[: int(count)].astype(np.uint8))
        rng = np.random.default_rng(7)
        needles = [
            pack_needle(rng.integers(97, 123, 8, dtype=np.uint8).tobytes(), 4)
            for _ in range(64)
        ]
        batch = NeedleBatch(staged, needles)

        def body(s, e, rows, words4, masks4, meta):
            spread = jax.lax.bitcast_convert_type(s * jnp.uint32(0x9E3779B1), jnp.int32)
            counts = _count_batch(rows, words4 ^ spread, masks4, meta, batch.k_words, False)
            return _fold(s, counts), e

        return body, (staged.rows, batch.words4, batch.masks4, batch.meta), ()

    bench("uncased-find-ascii64-8cp-128MB", mk_uncased_find_ascii, 64 * (128 << 20))

    # --- round-3 rows: Unicode tier (gather-free), sorting, AC, DNA DP ---

    def _multilingual_bytes(n_bytes, seed=5, spans=None):
        rng = np.random.default_rng(seed)
        if spans is None:
            spans = [(0x410, 0x44F), (0x391, 0x3C9), (0x41, 0x7A), (0xC0, 0xFF)]
        spans = list(spans)
        parts = []
        total = 0
        while total < n_bytes + 64:
            lo, hi = spans[int(rng.integers(0, len(spans)))]
            cps = rng.integers(lo, hi + 1, 24)
            b = ("".join(map(chr, cps)) + " ").encode()
            parts.append(b)
            total += len(b)
        buf = b"".join(parts)
        cut = n_bytes
        while cut > 0 and (buf[cut] & 0xC0) == 0x80:
            cut -= 1
        return np.frombuffer(buf[:cut], np.uint8)

    def _roll_body(fn):
        """Chained body over a flat byte stream with UTF-8-preserving
        whole-array roll perturbation (XOR would corrupt multibyte)."""

        def body(s, e, d):
            shift = (s % jnp.uint32(d.shape[0])).astype(jnp.int32)
            return _fold(s, fn(jnp.roll(d, shift))), e

        return body

    def mk_segment(kernel_name, nbytes, multilingual=False):
        def make():
            from stringwars_tpu.ops import segment as SEG

            data = (
                _multilingual_bytes(nbytes)
                if multilingual
                else _flat(nbytes)
            )
            max_cp = 0x4FF if multilingual else 0x7F
            dev = jax.device_put(data)
            n = int(data.shape[0])
            fn = getattr(SEG, kernel_name)

            def run(d):
                out = fn(d, n, max_cp=max_cp)
                return out if not isinstance(out, tuple) else out[1]

            return _roll_body(run), (dev,), ()

        return make

    # Segmentation feature scans run through the fused Pallas scanline
    # engine (ops/scanline.py) — program size is independent of stream
    # length, so these compile in seconds where the old XLA
    # associative_scan formulation SIGKILL'd the compile helper at every
    # benchmark size (32-128 MB, runs of 2026-08-18). 32 MB rows match
    # the round-3 registry; the 128 MB row proves scale-independence.
    _SEG_N = 32 << 20
    bench("tr29-words-32MB", mk_segment("word_boundaries", _SEG_N), _SEG_N)
    bench("tr29-graphemes-32MB", mk_segment("grapheme_boundaries", _SEG_N), _SEG_N)
    bench("tr29-sentences-32MB", mk_segment("sentence_boundaries", _SEG_N), _SEG_N)
    # The linebreak program sits at the compile helper's memory cliff
    # (finding #8): 25-40 min compiles that succeed ~half the time, at
    # BOTH 16 and 32 MB — the pain is program complexity, not stream
    # size. Measured result (twice): 0.26-0.27 GB/s.
    bench("uax14-lines-32MB", mk_segment("linebreak_opportunities", _SEG_N), _SEG_N)
    bench("whitespace-split-32MB", mk_segment("whitespace_token_count", _SEG_N), _SEG_N)
    bench("newline-split-32MB", mk_segment("newline_split_count", _SEG_N), _SEG_N)
    bench(
        "tr29-words-multilingual-32MB",
        mk_segment("word_boundaries", _SEG_N, multilingual=True),
        _SEG_N,
    )
    bench("tr29-words-128MB", mk_segment("word_boundaries", 128 << 20), 128 << 20)

    def mk_casefold_general(spans=None, max_cp=0x4FF, nbytes=32 << 20, width=32):
        def make():
            from stringwars_tpu.suites.normalization import stream_rows
            from stringwars_tpu.ops.casefold_pallas import fold_tokens_fused
            from stringwars_tpu.tape import PaddedTokens

            # Width-32 rows ride the fused Pallas fold (decode + rules +
            # keys in one kernel + a single packed sort); corpora whose
            # pruned rules expand past 2 cps fall back to the staged
            # pipeline inside fold_tokens_fused.
            data = _multilingual_bytes(nbytes, spans=spans)
            toks = stream_rows(data, width=width)

            def body(s, e, d, ln):
                shift = (s % jnp.uint32(d.shape[0])).astype(jnp.int32)
                rolled = PaddedTokens(
                    data=jnp.roll(d, shift, axis=0),
                    lengths=jnp.roll(ln, shift),
                    width=toks.width,
                )
                out, counts = fold_tokens_fused(rolled, max_cp)
                return _fold(s, counts, out[:, :8]), e

            return body, (toks.data, toks.lengths), ()

        return make

    bench("casefold-general-multilingual-32MB", mk_casefold_general(), 32 << 20)
    # Per-language rows matching the reference's fold table
    # (normalization/README.md:45-49: DE 2.59 / RU 2.20 / EL 1.00 GB/s on
    # Zen5); tighter corpora prune the fold rules further.
    bench(
        "casefold-german-32MB",
        mk_casefold_general(spans=((0x41, 0x7A), (0xC0, 0xFF)), max_cp=0xFF),
        32 << 20,
    )
    bench(
        "casefold-russian-32MB",
        mk_casefold_general(spans=((0x410, 0x44F), (0x401, 0x451)), max_cp=0x45F),
        32 << 20,
    )
    bench(
        "casefold-greek-32MB",
        mk_casefold_general(spans=((0x391, 0x3C9),), max_cp=0x3CF),
        32 << 20,
    )

    def mk_nfc(form):
        def make():
            from stringwars_tpu.suites.normalization import _normalize_routine, stream_rows

            data = _multilingual_bytes(32 << 20)
            toks = stream_rows(data)
            r = _normalize_routine(
                toks, np.asarray(toks.data), np.asarray(toks.lengths),
                form, form in ("nfkc", "nfkd"), int(data.shape[0]),
                max_cp=0x4FF,  # corpus ceiling: prunes the quick-check maps
            )
            return r.body, r.consts, r.extra0

        return make

    bench("nfc-multilingual-32MB", mk_nfc("nfc"), 32 << 20)
    bench("nfd-multilingual-32MB", mk_nfc("nfd"), 32 << 20)
    bench("nfkc-multilingual-32MB", mk_nfc("nfkc"), 32 << 20)
    bench("nfkd-multilingual-32MB", mk_nfc("nfkd"), 32 << 20)

    def mk_argsort_uncased():
        from stringwars_tpu.ops.sort import _clamp_utf8_boundary, _uncased_order

        B, W = 1 << 21, 15
        rng = np.random.default_rng(0)
        data = rng.integers(97, 123, (B, W), dtype=np.uint8)
        lengths = rng.integers(3, W + 1, B, dtype=np.int32)
        key_lengths = _clamp_utf8_boundary(data, lengths.astype(np.int64), W)
        d_dev = jax.device_put(data)
        l_dev = jax.device_put(key_lengths)
        n_cols = (W + 2) // 3

        def body(s, e, d, ln):
            shift = (s % jnp.uint32(d.shape[0])).astype(jnp.int32)
            order, counts = _uncased_order(
                jnp.roll(d, shift, axis=0), jnp.roll(ln, shift), n_cols, True
            )
            probe = jax.lax.dynamic_slice(
                order, ((s % jnp.uint32(d.shape[0] - 4096)).astype(jnp.int32),), (4096,)
            )
            return _fold(s, probe, counts[:64]), e

        return body, (d_dev, l_dev), ()

    n_cmp_u = (1 << 21) * 21
    bench(
        "argsort-uncased-2M-words", mk_argsort_uncased, (1 << 21) * 15,
        unit="Gcmp/s", elements=n_cmp_u,
    )

    def mk_ac_pallas():
        # Production route: the lane-gather LUT scan (automaton_luts wins
        # the cost model for this dictionary; the rule-walk kernel stays
        # the fallback for huge DFAs).
        from stringwars_tpu.ops.ahocorasick import (
            Automaton,
            _ac_scan_pallas_lut,
            automaton_luts,
            stage_cols,
        )

        n = 64 << 20
        auto = Automaton([b"the", b"and", b"tion", b"abcd"])
        cols, gpos0, overlap, limit = stage_cols(_flat(n), n, auto.max_len)
        mode, n_pm, tables = automaton_luts(auto)
        assert mode is not None
        meta = jnp.asarray([n, limit], jnp.int32)

        def body(s, e, mt, c, g0, *tabs):
            cnt = _ac_scan_pallas_lut(
                tuple(tabs), mt, c ^ _pert_u8(s).astype(jnp.int32), g0,
                mode, n_pm, overlap, False,
            )
            return _fold(s, cnt), e

        return body, (meta, cols, gpos0, *tables), ()

    bench("ac-pallas-64MB", mk_ac_pallas, 64 << 20)

    def mk_ac_shiftand():
        from stringwars_tpu.ops.ahocorasick import stage_cols
        from stringwars_tpu.ops.shiftand import ShiftAndSet, _sa_scan, stage_masks

        n = 64 << 20
        sa = ShiftAndSet([b"the", b"and", b"tion", b"abcd"])
        cols, gpos0, overlap, limit = stage_cols(_flat(n), n, sa.max_len)
        meta = jnp.asarray([n, limit], jnp.int32)
        masks = stage_masks(sa)

        def body(s, e, mt, mk, c, g0):
            cnt = _sa_scan(mt, mk, c ^ _pert_u8(s).astype(jnp.int32), g0, overlap, False)
            return _fold(s, cnt), e

        return body, (meta, masks, cols, gpos0), ()

    bench("ac-shiftand-64MB", mk_ac_shiftand, 64 << 20)

    def mk_ac_shiftand8():
        # Realistic dictionary set (> 32 total chars -> two state words).
        from stringwars_tpu.ops.ahocorasick import stage_cols
        from stringwars_tpu.ops.shiftand import ShiftAndSet, _sa_scan, stage_masks

        n = 64 << 20
        sa = ShiftAndSet(
            [b"needle", b"haystack", b"pattern", b"search", b"string", b"find", b"match", b"token"]
        )
        cols, gpos0, overlap, limit = stage_cols(_flat(n), n, sa.max_len)
        meta = jnp.asarray([n, limit], jnp.int32)
        masks = stage_masks(sa)

        def body(s, e, mt, mk, c, g0):
            cnt = _sa_scan(mt, mk, c ^ _pert_u8(s).astype(jnp.int32), g0, overlap, False)
            return _fold(s, cnt), e

        return body, (meta, masks, cols, gpos0), ()

    bench("ac-shiftand8-64MB", mk_ac_shiftand8, 64 << 20)

    def mk_myers_dna():
        from stringwars_tpu.ops.myers_pallas import _myers, myers_from_tokens

        rng = np.random.default_rng(0)
        Bp, L = 65536, 256
        alphabet = np.frombuffer(b"ACGT", np.uint8)
        a_toks = [alphabet[rng.integers(0, 4, L)].tobytes() for _ in range(64)]
        pairs_a = [a_toks[i % 64] for i in range(Bp)]
        pairs_b = [a_toks[(i * 7 + 1) % 64] for i in range(Bp)]
        mb = myers_from_tokens(pairs_a, pairs_b)

        def body(s, e, bp_, bc, bl, lw, lr, al):
            # Tile-axis roll (full batch entropy) + in-alphabet code XOR;
            # a bare &3 XOR is low-cardinality and risks being enumerated.
            shift = (s % jnp.uint32(bc.shape[0])).astype(jnp.int32)
            pert = (s & jnp.uint32(3)).astype(jnp.int32)
            out = _myers(
                jnp.roll(bp_, shift, axis=0), jnp.roll(bc, shift, axis=0) ^ pert,
                jnp.roll(bl, shift, axis=0), jnp.roll(lw, shift, axis=0),
                jnp.roll(lr, shift, axis=0), jnp.roll(al, shift, axis=0),
                mb.n_words, mb.nbits, False, last_word=mb.last_word,
            )
            return _fold(s, out), e

        return body, (mb.bp, mb.b_cols, mb.blen, mb.lastw, mb.lastr, mb.alen), ()

    dna_cells = 65536 * 256 * 256
    bench("lev-myers-dna-64kx256B", mk_myers_dna, dna_cells, unit="GCUPS", elements=dna_cells)

    def mk_vpu_ops():
        """u32 VPU lane-op roofline probe: R rounds of a 16-op bitwise
        chain (the Myers core's op mix) over a VMEM-resident [64, 8, 128]
        block inside one Pallas program. Reported unit = G lane-ops/s;
        calibrates the bit-parallel DP ceiling (PERFORMANCE.md roofline)."""
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ROWS, RNDS = 64, 256

        def kernel(x_ref, out_ref):
            def body(r, _):
                x = x_ref[...]
                y = x
                for _ in range(4):
                    # 4 ops per line x 4 lines = 16 dependent lane-ops
                    y = ((y + x) ^ (y | x)) & ~(y >> 1)
                x_ref[...] = y ^ jnp.uint32(r)
                return ()

            jax.lax.fori_loop(0, RNDS, body, ())
            out_ref[...] = x_ref[...]

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, 8, 128), jnp.uint32),
            )(x)

        x0 = np.random.default_rng(0).integers(0, 1 << 32, (ROWS, 8, 128), dtype=np.uint32)
        dev = jax.device_put(x0)

        def body(s, e, x):
            out = run(x ^ s)
            return _fold(s, out[:2]), e

        return body, (dev,), ()

    vpu_ops = 64 * 8 * 128 * 256 * 16  # rows x sublanes x lanes x rounds x ops
    bench("vpu-u32-ops-probe", mk_vpu_ops, vpu_ops, unit="Gop/s", elements=vpu_ops)

    run_benches()
    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
