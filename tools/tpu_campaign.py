#!/usr/bin/env python
"""Measure every kernel family on the real TPU chip; JSON results to stdout.

Waits for device health first (a killed client degrades the tunnel), then
benches each kernel with synchronized medians. Never kill this mid-compile:
run it to completion or not at all.
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

RESULTS: dict[str, dict] = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def wait_healthy(max_wait_s: float = 1200.0) -> bool:
    x = jax.device_put(np.arange(131072, dtype=np.uint32))
    f = jax.jit(lambda v: v + jnp.uint32(1))
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        jax.block_until_ready(f(x))
        samples = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            samples.append(time.perf_counter() - t0)
        ms = sorted(samples)[5] * 1e3
        if ms < 1.0:
            log(f"device healthy (dispatch {ms:.2f} ms)")
            return True
        log(f"device degraded (dispatch {ms:.2f} ms); waiting 60s...")
        time.sleep(60)
    return False


# Two-pass protocol: pass 1 compiles every program (long compiles degrade
# the tunneled device to a ~28 ms dispatch floor, poisoning any timing that
# follows), then one recovery wait, then pass 2 times cache-warm programs.
_BENCHES: list = []


def bench(name, fn, work_bytes, unit="GB/s", elements=None, iters=7):
    _BENCHES.append((name, fn, work_bytes, unit, elements, iters))


def run_benches():
    for name, fn, *_ in _BENCHES:
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            log(f"compiled {name} in {time.perf_counter() - t0:.1f}s")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"{name}: COMPILE FAILED {e}")
    log("compile pass done; waiting for device recovery")
    wait_healthy()
    for name, fn, work_bytes, unit, elements, iters in _BENCHES:
        if name in RESULTS:
            continue
        try:
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(fn())
                ts.append(time.perf_counter() - t0)
            sec = sorted(ts)[len(ts) // 2]
            value = (elements if elements else work_bytes) / sec / 1e9
            RESULTS[name] = {
                "value": round(value, 2),
                "unit": unit,
                "ms": round(sec * 1e3, 3),
            }
            log(f"{name}: {value:.2f} {unit} ({sec * 1e3:.2f} ms)")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"{name}: FAILED {e}")


def main():
    if not wait_healthy():
        print(json.dumps({"error": "device never became healthy"}))
        return
    rng = np.random.default_rng(0)

    from stringwars_tpu.ops.bytesum import _bytesum_parts, _chunk_shape
    from stringwars_tpu.ops import find as F
    from stringwars_tpu.ops import hash as H
    from stringwars_tpu.ops import similarity as S
    from stringwars_tpu.ops.fingerprint import fingerprint
    from stringwars_tpu.ops.memops import fill_random, lut_translate, invert_case_lut
    from stringwars_tpu.tape import PaddedTokens

    N = 256 << 20
    flat = rng.integers(97, 123, N, dtype=np.uint8)
    rows, chunk = _chunk_shape(N)
    padded = np.zeros(rows * chunk, np.uint8)
    padded[:N] = flat
    dev_flat = jax.device_put(padded)
    bench("bytesum-256MB", lambda: _bytesum_parts(dev_flat, N), N)

    # K1 find: staged haystack, 8-byte needle.
    n_find = 128 << 20
    needle = F.pack_needle(b"abcdefgh", 4)
    needle16 = F.pack_needle(b"abcdefghabcdefgh", 16)
    hay = jax.device_put(np.asarray(F._staged(jnp.asarray(flat[:n_find]), n_find, 16)))
    bench("find-8B-needle-128MB", lambda: F._count_from_mask(hay, needle, n_find), n_find)
    bench("find-16B-needle-128MB", lambda: F._count_from_mask(hay, needle16, n_find), n_find)

    from stringwars_tpu.ops.find import byteset_count, pack_byteset

    table = pack_byteset(b"0123456789")
    bench("byteset-128MB", lambda: byteset_count(hay, table, n_find), n_find)

    # K3 hash: long lines.
    B, W = 131072, 1024
    data = rng.integers(0, 256, (B, W), dtype=np.uint8)
    toks = PaddedTokens(
        data=jax.device_put(data),
        lengths=jax.device_put(np.full(B, W - 7, np.int32)),
        width=W,
    )
    lay = jax.block_until_ready(H.prepare(toks))
    xxh64_j = jax.jit(H.xxh64)
    bench("xxh64-1KB-lines-128MB", lambda: xxh64_j(lay), B * W)
    xxh32_j = jax.jit(H.xxh32)
    bench("xxh32-1KB-lines-128MB", lambda: xxh32_j(lay), B * W)

    Bw, Ww = 2_000_000, 64
    dataw = rng.integers(0, 256, (Bw, Ww), dtype=np.uint8)
    toksw = PaddedTokens(
        data=jax.device_put(dataw),
        lengths=jax.device_put(rng.integers(1, 16, Bw, dtype=np.int32)),
        width=Ww,
    )
    layw = jax.block_until_ready(H.prepare(toksw))
    bench("xxh64-words-128MB", lambda: xxh64_j(layw), Bw * Ww)

    seeds16 = np.arange(16, dtype=np.uint64)
    multi_j = jax.jit(lambda l: H.xxh64_multiseed(l, seeds16))
    bench("xxh64-multiseed16-1KB", lambda: multi_j(lay), B * W)

    # K5 Levenshtein: 1024 pairs of 256B.
    L = 256
    Bp = 1024
    a = rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)
    b = rng.integers(65, 69, (Bp, L), dtype=np.uint8).astype(np.int32)
    pairs = S.PairBatch(
        a=jax.device_put(a),
        b=jax.device_put(b),
        a_len=jax.device_put(np.full(Bp, L, np.int32)),
        b_len=jax.device_put(np.full(Bp, L, np.int32)),
    )
    cells = Bp * L * L
    lev_j = jax.jit(S.levenshtein)
    bench("levenshtein-1024x256B", lambda: lev_j(pairs), cells, unit="GCUPS", elements=cells)
    nw_j = jax.jit(S.nw_score_affine)
    bench("nw-affine-1024x256B", lambda: nw_j(pairs), cells, unit="GCUPS", elements=cells)

    # K6 fingerprints: 512-dim over 16K 1KB-docs.
    fp_j = jax.jit(lambda t: fingerprint(t, ndim=512, with_counts=False))
    docsB = 16384
    docs = PaddedTokens(
        data=jax.device_put(data[:docsB]),
        lengths=jax.device_put(np.full(docsB, W - 7, np.int32)),
        width=W,
    )
    bench("fingerprint-512d-16MB", lambda: fp_j(docs), docsB * W)

    # K12: LUT + PRNG.
    lut = jnp.asarray(invert_case_lut())
    lut_j = jax.jit(lut_translate)
    dev128 = jax.device_put(flat[: 128 << 20])
    bench("lut-translate-128MB", lambda: lut_j(dev128, lut), 128 << 20)
    fr_j = jax.jit(fill_random, static_argnames=("n",))
    bench("fill-random-128MB", lambda: fr_j(7, 128 << 20), 128 << 20)

    # K2 AC scan.
    from stringwars_tpu.ops.ahocorasick import Automaton, ac_count

    a2 = Automaton([b"the", b"and", b"tion", b"ab"])
    hay_small = flat[: 16 << 20]
    bench("ac-scan-16MB", lambda: jnp.asarray(ac_count(a2, hay_small, chunk=1024)), 16 << 20)

    # K13 ChaCha corpus encrypt.
    from stringwars_tpu.ops.chacha import chacha20_xor

    bench("chacha20-xor-128MB", lambda: chacha20_xor(bytes(range(32)), bytes(12), dev128), 128 << 20)

    run_benches()
    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
