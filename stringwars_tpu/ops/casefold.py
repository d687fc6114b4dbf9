"""Case folding, uncased compare/search, canonical normalization (K10).

Reference rows: ``sz::utf8_uncased_fold`` (full Unicode fold into an
expansion-aware buffer), ``utf8_norm`` NFC/NFD/NFKC/NFKD,
``utf8_uncased_order`` (case-insensitive compare), ``utf8_uncased_search``
(all caseless matches; only PCRE2 among the reference baselines does
*full* folding ß→ss — ``normalization/bench.rs:381-386`` — and so does
this module).

Pipeline shape: byte stream → UTF-32 (K8 decode) → table map with 1→N
expansion (scatter over prefix-sum destinations) → downstream compare /
window search on int32 codepoint lanes. Tables are 4.4 MB replicated
constants generated from UCD 15.0 (``stringwars_tpu.unicode.tables``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stringwars_tpu.ops.utf8 import utf8_decode
from stringwars_tpu.unicode import tables

_MAX_EXPANSION = 3  # full case fold expands to at most 3 codepoints


@functools.lru_cache(maxsize=None)
def _fold_arrays():
    # Cached as numpy so jit tracing embeds them as constants (never cache
    # jnp arrays created under a trace — they would be leaked tracers).
    inline, multi, pool = tables.casefold_tables()
    return inline, multi.astype(np.int32), pool


@functools.partial(jax.jit, static_argnames=("n",))
def fold_codepoints(cps: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """Full-case-fold a codepoint stream: returns (folded int32[ceil(3n)],
    folded_count). Slots past the count are zero."""
    inline_np, multi_np, pool_np = _fold_arrays()
    inline, multi, pool = jnp.asarray(inline_np), jnp.asarray(multi_np), jnp.asarray(pool_np)
    cp = cps[:n]
    f = jnp.take(inline, cp)
    is_multi = f < 0
    m = jnp.take(multi, cp)
    length = jnp.where(is_multi, m & 31, 1)
    pool_off = m >> 5
    out_n = n * _MAX_EXPANSION
    starts = jnp.cumsum(length) - length
    out = jnp.zeros((out_n,), jnp.int32)
    for k in range(_MAX_EXPANSION):
        val = jnp.where(is_multi, jnp.take(pool, jnp.clip(pool_off + k, 0, pool.shape[0] - 1)), f)
        dst = jnp.where(k < length, starts + k, out_n)
        out = out.at[dst].set(val, mode="drop")
    return out, jnp.sum(length, dtype=jnp.int32)


@jax.jit
def fold_tokens_ascii(tokens) -> tuple[jax.Array, jax.Array]:
    """ASCII fast-path full case fold: bytewise, 1:1, no scatters.

    For pure-ASCII tokens the full Unicode fold IS lowercase (every
    1→N expansion starts above U+00DF), so folding is three vector ops
    per byte instead of the general kernel's decode + expansion
    scatters — the TPU analog of the reference kernels' ASCII runs
    (case fold on English measures 7.53 GB/s there,
    ``normalization/README.md``). Returns (folded uint8[B, W],
    counts = lengths). Caller guarantees ASCII purity (see
    :func:`fold_tokens_auto`)."""
    data = tokens.data
    is_upper = (data >= 65) & (data <= 90)
    return jnp.where(is_upper, data | jnp.uint8(0x20), data), tokens.lengths


def fold_tokens_auto(tokens, data_np=None):
    """Dispatch the ASCII fast path when the batch is pure ASCII.

    ``data_np`` (host bytes, optional) avoids a device readback for the
    purity check; staging-time dispatch mirrors the reference's
    run-length ASCII specialization. Returns (folded, counts, ascii_flag)
    where ``folded`` is uint8[B, W] on the fast path and the expanded
    int32 codepoint matrix otherwise."""
    import numpy as np

    probe = data_np if data_np is not None else np.asarray(tokens.data)
    if not probe.size or int(probe.max()) < 0x80:
        folded, counts = fold_tokens_ascii(tokens)
        return folded, counts, True
    folded, counts = fold_tokens(tokens)
    return folded, counts, False


def fold_bytes(data, n: int | None = None) -> tuple[jax.Array, jax.Array]:
    """UTF-8 bytes → folded codepoint stream (decode + fold)."""
    data = jnp.asarray(data, jnp.uint8)
    n = int(data.shape[0]) if n is None else n
    cps, count = utf8_decode(data, n)
    # Fold over the compacted prefix; count is dynamic, so fold the full
    # padded buffer (slots past count are zero == no expansion).
    folded, fcount = fold_codepoints(cps, cps.shape[0])
    # Zero-slots fold to zero and occupy one output slot each; subtract.
    pad_slots = jnp.int32(cps.shape[0]) - count
    return folded, fcount - pad_slots


def fold_text(text: str) -> str:
    """Host convenience: full case fold of a Python string via the tables
    (tests compare against str.casefold())."""
    data = np.frombuffer(text.encode(), np.uint8)
    folded, count = fold_bytes(data)
    return "".join(chr(c) for c in np.asarray(folded)[: int(count)])


# ---------------------------------------------------------------------------
# Uncased compare / search
# ---------------------------------------------------------------------------

def uncased_equal(a: bytes, b: bytes) -> bool:
    """Full-fold case-insensitive equality (reference
    ``utf8_uncased_order`` == 0; ``normalization/bench.rs:249-254``)."""
    fa, ca = fold_bytes(np.frombuffer(a, np.uint8))
    fb, cb = fold_bytes(np.frombuffer(b, np.uint8))
    ca, cb = int(ca), int(cb)
    if ca != cb:
        return False
    return bool(np.array_equal(np.asarray(fa)[:ca], np.asarray(fb)[:cb]))


@functools.partial(jax.jit, static_argnames=("m",))
def _window_count(hay_cp: jax.Array, needle_cp: jax.Array, hay_n: jax.Array, m: int) -> jax.Array:
    """Count occurrences of an m-cp needle in a codepoint stream."""
    n = hay_cp.shape[0]
    acc = jnp.ones((n,), bool)
    for j in range(m):
        shifted = jnp.pad(hay_cp, (0, m))[j : j + n]
        acc &= shifted == needle_cp[j]
    pos = jnp.arange(n, dtype=jnp.int32)
    acc &= pos <= hay_n - m
    return jnp.sum(acc, dtype=jnp.int32)


def uncased_count(haystack_folded: tuple[jax.Array, jax.Array], needle: bytes) -> int:
    """All caseless matches of ``needle`` in a pre-folded haystack stream.

    Match positions are in folded-codepoint space (the PCRE2-caseless
    semantic); the haystack fold is amortized across needles like the
    reference reuses its uncased needles (``normalization/bench.rs:334-351``).
    """
    folded, count = haystack_folded
    fn, fm = fold_bytes(np.frombuffer(needle, np.uint8))
    fm = int(fm)
    if fm == 0:
        return 0
    needle_cp = jnp.asarray(np.asarray(fn)[:fm])
    return int(_window_count(folded, needle_cp, count, fm))


# ---------------------------------------------------------------------------
# Batched per-token fold + caseless equality
# ---------------------------------------------------------------------------

@jax.jit
def fold_tokens(tokens) -> tuple[jax.Array, jax.Array]:
    """Row-wise full case fold of a PaddedTokens batch.

    Returns (folded int32[B, 3W], folded_count int32[B]); each row is the
    folded codepoint sequence of that token (compacted to the row front).
    """
    data = tokens.data.astype(jnp.int32)  # [B, W]
    B, W = data.shape
    lengths = tokens.lengths[:, None]
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = pos < lengths

    # Row-wise UTF-8 decode.
    def nxt(k):
        return jnp.pad(data, ((0, 0), (0, k)))[:, k:] & 0x3F if k else data

    width = jnp.where(
        data < 0x80,
        1,
        jnp.where(data < 0xC0, 0, jnp.where(data < 0xE0, 2, jnp.where(data < 0xF0, 3, jnp.where(data < 0xF8, 4, 0)))),
    )
    b1, b2, b3 = nxt(1), nxt(2), nxt(3)
    cp = jnp.where(
        width == 1,
        data,
        jnp.where(
            width == 2,
            ((data & 0x1F) << 6) | b1,
            jnp.where(
                width == 3,
                ((data & 0x0F) << 12) | (b1 << 6) | b2,
                ((data & 0x07) << 18) | (b1 << 12) | (b2 << 6) | b3,
            ),
        ),
    )
    is_lead = ((data & 0xC0) != 0x80) & valid
    dst = jnp.cumsum(is_lead.astype(jnp.int32), axis=1) - 1
    dst = jnp.where(is_lead, dst, W)
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, W))
    cps = jnp.zeros((B, W), jnp.int32).at[rows, dst].set(cp, mode="drop")
    cp_count = jnp.sum(is_lead.astype(jnp.int32), axis=1)

    # Row-wise fold with 1->N expansion.
    inline_np, multi_np, pool_np = _fold_arrays()
    inline = jnp.asarray(inline_np)
    multi = jnp.asarray(multi_np)
    pool = jnp.asarray(pool_np)
    f = jnp.take(inline, cps)
    is_multi = f < 0
    m = jnp.take(multi, cps)
    length = jnp.where(is_multi, m & 31, 1)
    # Slots past cp_count fold 1:1 (zeros); exclude them from the output by
    # clamping their expansion to land past the row end.
    in_row = jnp.arange(W, dtype=jnp.int32)[None, :] < cp_count[:, None]
    length = jnp.where(in_row, length, 0)
    starts = jnp.cumsum(length, axis=1) - length
    out = jnp.zeros((B, _MAX_EXPANSION * W), jnp.int32)
    rows3 = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, W))
    for k in range(_MAX_EXPANSION):
        val = jnp.where(is_multi, jnp.take(pool, jnp.clip((m >> 5) + k, 0, pool.shape[0] - 1)), f)
        d = jnp.where(k < length, starts + k, _MAX_EXPANSION * W)
        out = out.at[rows3, d].set(val, mode="drop")
    return out, jnp.sum(length, axis=1, dtype=jnp.int32)


def uncased_equal_batch(a_tokens, b_tokens) -> jax.Array:
    """bool[B]: full-fold caseless equality of token pairs (one dispatch)."""
    fa, ca = fold_tokens(a_tokens)
    fb, cb = fold_tokens(b_tokens)
    W = max(fa.shape[1], fb.shape[1])
    if fa.shape[1] < W:
        fa = jnp.pad(fa, ((0, 0), (0, W - fa.shape[1])))
    if fb.shape[1] < W:
        fb = jnp.pad(fb, ((0, 0), (0, W - fb.shape[1])))
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    agree = (fa == fb) | (pos >= ca[:, None])
    return (ca == cb) & jnp.all(agree, axis=1)
