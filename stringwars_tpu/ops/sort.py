"""Stable string argsort, byte order and case-folded order (family K11).

Reference rows: ``sz::argsort`` (+ ``.uncased()``), arrow lexsort, polars
(``sequence/bench.rs:51-259``); all competitors forced stable; work metric
n*log2(n) "comparisons" (``sequence/bench.rs:79``).

TPU-native design: **LSD radix over packed key columns**. Each uint32
column packs three 9-bit values (byte + 1; padding = 0, so shorter strings
that are prefixes sort first, exactly byte order). Passes run from the
least-significant column to the most-significant; every pass is one
gather + one stable ``argsort`` — dense XLA sorts, no string compares.
The case-folded variant builds columns from full-case-folded codepoints
(21-bit, one per column) so ordering matches fold(a) < fold(b).
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
    """Stable byte-order argsort: returns int32[B] permutation."""
    return _lsd_argsort(_byte_columns(tokens.data, tokens.lengths))


def argsort_tape(tape: Tape) -> np.ndarray:
    """Host entry: argsort all tokens of a tape (indices into tape order)."""
    tokens = PaddedTokens.from_tape(tape, align=4)
    return np.asarray(argsort_tokens(tokens))


def argsort_uncased(tape: Tape) -> np.ndarray:
    """Case-folded order: sort keys are full-case-folded codepoints.

    Mirrors ``sz::argsort.uncased()`` / ``utf8_uncased_order`` sorting
    (``sequence/bench.rs:86-93``): compares fold(a) vs fold(b) as
    codepoint sequences.
    """
    from stringwars_tpu.ops.casefold import fold_bytes

    folded_list = []
    max_len = 1
    for token in tape.to_list():
        arr = np.frombuffer(token, np.uint8)
        folded, count = fold_bytes(arr)
        f = np.asarray(folded)[: int(count)]
        folded_list.append(f)
        max_len = max(max_len, f.shape[0])
    B = len(folded_list)
    mat = np.zeros((B, max_len), np.int32)
    lengths = np.zeros(B, np.int32)
    for i, f in enumerate(folded_list):
        mat[i, : f.shape[0]] = f + 1  # +1 so padding 0 sorts first
        lengths[i] = f.shape[0]
    cols = jnp.asarray(mat.T.astype(np.uint32))  # one 21-bit cp per column
    return np.asarray(_lsd_argsort(cols))


def sorted_tokens(tape: Tape, *, uncased: bool = False) -> list[bytes]:
    order = argsort_uncased(tape) if uncased else argsort_tape(tape)
    tokens = tape.to_list()
    return [tokens[i] for i in order]
