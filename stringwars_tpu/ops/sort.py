"""Stable string argsort, byte order and case-folded order (family K11).

Reference rows: ``sz::argsort`` (+ ``.uncased()``), arrow lexsort, polars
(``sequence/bench.rs:51-259``); all competitors forced stable; work metric
n*log2(n) "comparisons" (``sequence/bench.rs:79``); caller-owned ``out``
index buffer like the Python reference (``sequence/bench.py:212-232``).

TPU-native design: **LSD radix over packed key columns**. Each uint32
column packs three 9-bit values (byte + 1; padding = 0, so shorter strings
that are prefixes sort first, exactly byte order). Passes run from the
least-significant column to the most-significant; every pass is one
gather + one stable ``argsort`` — dense XLA sorts, no string compares.

Long tails don't inflate the key matrix: the device sorts a
``prefix_width``-byte key, and rows that tie on a maxed-out prefix (rare)
are refined host-side with a stable full-token sort — so one 4 KB line in
a words corpus costs a few tie comparisons, not a 64x wider matrix.

The case-folded variant builds its keys from the batched full case fold
(``casefold.fold_tokens`` — one device dispatch for the whole batch),
clamping each prefix to a UTF-8 boundary so a split multibyte char can't
produce garbage codepoints; fold(prefix) is a prefix of fold(token), so
prefix ordering is exact and ties refine with ``str.casefold``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stringwars_tpu.tape import PaddedTokens, Tape


def _byte_columns(data: jax.Array, lengths: jax.Array) -> jax.Array:
    """[n_cols, B] uint32 packed key columns (3 bytes + 1 each)."""
    B, W = data.shape
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    vals = jnp.where(pos < lengths[:, None], data.astype(jnp.uint32) + 1, 0)
    n_cols = (W + 2) // 3
    padded = jnp.pad(vals, ((0, 0), (0, n_cols * 3 - W)))
    groups = padded.reshape(B, n_cols, 3)
    packed = (groups[:, :, 0] << 18) | (groups[:, :, 1] << 9) | groups[:, :, 2]
    return packed.T  # [n_cols, B]


@jax.jit
def _lsd_argsort(columns: jax.Array) -> jax.Array:
    """Stable LSD radix argsort over [n_cols, B] key columns."""
    n_cols, B = columns.shape
    order = jnp.arange(B, dtype=jnp.int32)

    def body(order, col):
        keys = jnp.take(col, order)
        idx = jnp.argsort(keys, stable=True)
        return jnp.take(order, idx), None

    order, _ = jax.lax.scan(body, order, columns[::-1])
    return order


def argsort_tokens(tokens: PaddedTokens) -> jax.Array:
    """Stable byte-order argsort of a padded batch: int32[B] permutation."""
    return _lsd_argsort(_byte_columns(tokens.data, tokens.lengths))


def _write_out(order: np.ndarray, out):
    if out is None:
        return order
    out[: order.shape[0]] = order
    return out


def _refine_ties(order: np.ndarray, tie_with_next: np.ndarray, key_of_index) -> np.ndarray:
    """Stable host-side re-sort of each run of prefix-tied rows."""
    if not tie_with_next.any():
        return order
    boundaries = np.flatnonzero(~tie_with_next)
    start = 0
    order = order.copy()
    for end in boundaries:
        if end > start:
            run = sorted(order[start : end + 1].tolist(), key=key_of_index)
            order[start : end + 1] = run
        start = end + 1
    if start < order.shape[0] - 1:
        run = sorted(order[start:].tolist(), key=key_of_index)
        order[start:] = run
    return order


def argsort_tape(tape: Tape, *, prefix_width: int = 96, out=None) -> np.ndarray:
    """Stable byte-order argsort of all tokens (indices into tape order).

    Device-sorts a ``prefix_width``-byte radix key; rows tying on a
    maxed-out prefix are refined host-side. ``out`` (optional) is a
    caller-owned index buffer written in place.
    """
    o = np.asarray(tape.offsets).astype(np.int64)
    full_lengths = o[1:] - o[:-1]
    tokens = PaddedTokens.from_tape(tape, align=4, max_width=prefix_width)
    order = np.asarray(argsort_tokens(tokens))
    if full_lengths.size and int(full_lengths.max()) > prefix_width:
        mat = np.asarray(tokens.data)
        sorted_mat = mat[order]
        # >= not >: a row of length exactly prefix_width has an identical
        # radix key to a longer row sharing its prefix, and must refine too.
        maxed = full_lengths[order] >= prefix_width
        tie = (
            (sorted_mat[1:] == sorted_mat[:-1]).all(axis=1) & (maxed[1:] | maxed[:-1])
        )
        toks = tape.to_list()
        order = _refine_ties(order, tie, toks.__getitem__)
    return _write_out(order, out)


def _clamp_utf8_boundary(mat: np.ndarray, lengths: np.ndarray, K: int) -> np.ndarray:
    """Per-row key length clamped so no multibyte char is split at K."""
    clamped = np.minimum(lengths, K)
    long = lengths > K
    if not long.any():
        return clamped.astype(np.int32)
    b = mat.astype(np.int32)
    width = np.where(
        b < 0x80, 1, np.where(b < 0xC0, 0, np.where(b < 0xE0, 2, np.where(b < 0xF0, 3, 4)))
    )
    cut = np.full(lengths.shape[0], K, np.int64)
    found = ~long
    for p in (K - 1, K - 2, K - 3):
        if p < 0:
            break
        w = width[:, p]
        is_lead = w > 0
        hit = ~found & is_lead
        cut = np.where(hit & (p + w > K), p, cut)
        found |= is_lead
    return np.where(long, cut, clamped).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("n_cols", "pack3"))
def _uncased_order(tokens_data, key_lengths, n_cols: int, pack3: bool):
    from stringwars_tpu.ops.casefold import fold_tokens

    folded, counts = fold_tokens(
        PaddedTokens(data=tokens_data, lengths=key_lengths, width=tokens_data.shape[1])
    )
    pos = jnp.arange(folded.shape[1], dtype=jnp.int32)[None, :]
    vals = jnp.where(pos < counts[:, None], folded.astype(jnp.uint32) + 1, 0)
    vals = vals[:, : n_cols * (3 if pack3 else 1)]
    if pack3:
        groups = vals.reshape(vals.shape[0], n_cols, 3)
        cols = (groups[:, :, 0] << 18) | (groups[:, :, 1] << 9) | groups[:, :, 2]
    else:
        cols = vals
    return _lsd_argsort(cols.T), counts


def argsort_uncased(tape: Tape, *, prefix_width: int = 96, out=None) -> np.ndarray:
    """Case-folded order: sort keys are full-case-folded codepoints.

    Mirrors ``sz::argsort.uncased()`` / ``utf8_uncased_order`` sorting
    (``sequence/bench.rs:86-93``): compares fold(a) vs fold(b) as
    codepoint sequences. One batched fold + radix sort on device; ties on
    maxed-out prefixes refine host-side with ``str.casefold``.
    """
    o = np.asarray(tape.offsets).astype(np.int64)
    full_lengths = o[1:] - o[:-1]
    tokens = PaddedTokens.from_tape(tape, align=4, max_width=prefix_width)
    mat = np.asarray(tokens.data)
    key_lengths = _clamp_utf8_boundary(mat, full_lengths, min(prefix_width, mat.shape[1]))

    # One probe fold decides the column packing (ASCII-ish folds fit 9 bits).
    from stringwars_tpu.ops.casefold import fold_tokens

    folded, counts = fold_tokens(
        PaddedTokens(data=tokens.data, lengths=jnp.asarray(key_lengths), width=mat.shape[1])
    )
    max_count = int(jnp.max(counts)) if counts.shape[0] else 1
    max_cp = int(jnp.max(folded)) if counts.shape[0] else 0
    pack3 = max_cp <= 509  # cp + 1 must fit 9 bits
    n_cols = max(1, (-(-max_count // 3)) if pack3 else max_count)
    order_dev, _ = _uncased_order(tokens.data, jnp.asarray(key_lengths), n_cols, pack3)
    order = np.asarray(order_dev)

    # >= not >: length-== -prefix_width rows can tie a longer row's folded
    # prefix key exactly and still need host refinement (see argsort_tape).
    maxed = full_lengths >= min(prefix_width, mat.shape[1])
    if maxed.any():
        folded_np = np.asarray(folded)
        counts_np = np.asarray(counts)
        sorted_f = folded_np[order]
        sorted_c = counts_np[order]
        eq = (sorted_f[1:] == sorted_f[:-1]).all(axis=1) & (sorted_c[1:] == sorted_c[:-1])
        tie = eq & (maxed[order][1:] | maxed[order][:-1])
        toks = tape.to_list()

        def fold_key(i):
            return toks[i].decode("utf-8", "ignore").casefold()

        order = _refine_ties(order, tie, fold_key)
    return _write_out(order, out)


def sorted_tokens(tape: Tape, *, uncased: bool = False) -> list[bytes]:
    order = argsort_uncased(tape) if uncased else argsort_tape(tape)
    tokens = tape.to_list()
    return [tokens[i] for i in order]
