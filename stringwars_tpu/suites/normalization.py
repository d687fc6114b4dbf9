"""Normalization suite: case-fold, NFC/NFD/NFKC/NFKD, case-insensitive
compare and find (reference ``normalization/bench.rs``, defaults 3 s + 20 s,
lines tokens on multilingual corpora).
"""

from __future__ import annotations

import itertools
import unicodedata

import jax
import jax.numpy as jnp
import numpy as np

from stringwars_tpu.ops import casefold as CF
from stringwars_tpu.ops import normalize as NORM
from stringwars_tpu.ops.utf8 import utf8_decode
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits, sync


def main() -> None:
    ctx = setup_suite(
        "Unicode normalization + caseless search throughput",
        default_tokens="file",
        default_warmup=3.0,
        default_time=20.0,
        default_synthetic="multilingual",
    )
    n = ctx.tape.total_bytes
    data = jnp.asarray(np.asarray(ctx.tape.data)[:n])
    host_text = np.asarray(data).tobytes().decode("utf-8", "ignore")

    cps, count = utf8_decode(data, n)
    cps = jax.block_until_ready(cps)

    ctx.group("case-fold")
    fold = jax.jit(CF.fold_codepoints, static_argnames=("n",))
    ctx.run(
        "case-fold/swtpu::utf8_fold<1chip>",
        "bytes",
        lambda: (sync(fold(cps, cps.shape[0])), WorkUnits(1, n))[1],
    )
    # ASCII fast path (the reference kernels specialize ASCII runs the same
    # way; on English corpora this is the production fold).
    if int(np.asarray(data).max(initial=0)) < 0x80:
        from stringwars_tpu.tape import PaddedTokens

        _rows = (n + 1023) // 1024
        _buf = np.zeros((_rows, 1024), np.uint8)
        _buf.reshape(-1)[:n] = np.asarray(data)[:n]
        _toks = PaddedTokens(
            data=jnp.asarray(_buf),
            lengths=jnp.full(_rows, 1024, jnp.int32),
            width=1024,
        )
        fold_a = jax.jit(CF.fold_tokens_ascii)
        ctx.run(
            "case-fold/swtpu::ascii_fold<1chip>",
            "bytes",
            lambda: (sync(fold_a(_toks)), WorkUnits(1, n))[1],
        )
    ctx.run(
        "case-fold/str.casefold",
        "bytes",
        lambda: (host_text.casefold(), WorkUnits(1, n))[1],
    )

    for form in ("nfc", "nfd", "nfkc", "nfkd"):
        ctx.group(f"normalize-{form}")
        compat = form in ("nfkc", "nfkd")
        if form in ("nfd", "nfkd"):
            kern = jax.jit(NORM.decompose, static_argnames=("n", "compat"))
            routine = lambda k=kern, c=compat: (
                sync(k(cps, cps.shape[0], c)),
                WorkUnits(1, n),
            )[1]
        else:
            kern = jax.jit(NORM._nfc_padded, static_argnames=("n", "compat"))
            routine = lambda k=kern, c=compat: (
                sync(k(cps, cps.shape[0], c)),
                WorkUnits(1, n),
            )[1]
        ctx.run(f"normalize-{form}/swtpu::utf8_norm<1chip>", "bytes", routine)
        ctx.run(
            f"normalize-{form}/unicodedata.normalize",
            "bytes",
            lambda f=form.upper(): (unicodedata.normalize(f, host_text), WorkUnits(1, n))[1],
        )

    ctx.group("case-insensitive-compare")
    # Adjacent line pairs, capped 1000 (reference normalization/bench.rs:249-254).
    lines = [ln.encode() for ln in host_text.split("\n") if ln][:1001]
    pairs = list(zip(lines, lines[1:]))[:1000]
    pair_bytes = sum(len(a) + len(b) for a, b in pairs)

    from stringwars_tpu.tape import PaddedTokens, Tape

    a_toks = PaddedTokens.from_tape(Tape.from_tokens([p[0] for p in pairs] or [b"x"]), align=4)
    b_toks = PaddedTokens.from_tape(Tape.from_tokens([p[1] for p in pairs] or [b"x"]), align=4)

    def cmp_routine() -> WorkUnits:
        jax.block_until_ready(CF.uncased_equal_batch(a_toks, b_toks))
        return WorkUnits(len(pairs), pair_bytes)

    ctx.run("case-insensitive-compare/swtpu::uncased_eq<1chip>", "comparisons", cmp_routine)

    def host_cmp() -> WorkUnits:
        for a, b in pairs:
            a.decode("utf-8", "ignore").casefold() == b.decode("utf-8", "ignore").casefold()
        return WorkUnits(len(pairs), pair_bytes)

    ctx.run("case-insensitive-compare/casefold-eq", "comparisons", host_cmp)

    ctx.group("case-insensitive-find")
    # 100 seeded random needles >= 3 bytes (reference normalization/bench.rs:334-351).
    rng = np.random.default_rng(42)
    words = [w for w in host_text.split() if len(w.encode()) >= 3]
    needles = [words[i].encode() for i in rng.integers(0, max(len(words), 1), 100)] if words else []
    folded_hay = CF.fold_bytes(np.asarray(data))
    jax.block_until_ready(folded_hay)
    needle_cycle = itertools.cycle(needles or [b"xyz"])

    def find_routine() -> WorkUnits:
        needle = next(needle_cycle)
        matches = CF.uncased_count(folded_hay, needle)
        return WorkUnits(max(matches, 1), n)

    ctx.run("case-insensitive-find/swtpu::uncased_find<1chip>", "bytes", find_routine)

    lower_text = host_text.casefold()
    host_cycle = itertools.cycle([nd.decode("utf-8", "ignore").casefold() for nd in (needles or [b"xyz"])])

    def host_find() -> WorkUnits:
        needle = next(host_cycle)
        count = lower_text.count(needle)
        return WorkUnits(max(count, 1), n)

    ctx.run("case-insensitive-find/casefold-count", "bytes", host_find)


if __name__ == "__main__":
    main()
