"""Multi-pattern Shift-And scan (family K2 fast path for small sets).

The Aho-Corasick flat-key rule scan (``ops/ahocorasick.py``) costs ~3 VPU
ops per DFA-table step boundary per byte — fine for a handful of
patterns, but the rule count grows with states x distinct transitions
(~600 rules for 8 English words). Bitap/Shift-And is size-independent:
concatenate the patterns into one bit-position space (bit p = "a match
of some pattern's first p' chars ends here"), then per byte

    state = ((state << 1) | start_mask) & mask(byte)
    hits += popcount(state & final_mask)

where ``mask(byte)`` has bit p set iff pattern char p equals the byte —
built on the fly from 8 precomputed bitplanes with the same XOR-mask
trick as the Myers kernel (``ops/myers_pallas.py``): ~30 lane-ops per
byte regardless of pattern count, vs ~3 x rules for the DFA scan.

Counting semantics match AC exactly (every occurrence of every pattern,
including overlaps and patterns inside patterns: a final bit fires at
every end position). Total pattern length up to 64 chars rides two u32
state words per lane (the cross-word carry is one extra shift-OR; no
pattern straddles the word boundary — staging pads to it); bigger sets
fall back to the DFA scan (``ac_count``).

Chunk decomposition mirrors the AC kernel: the Shift-And state after any
prefix depends on only the last ``max_len - 1`` bytes, so 1024 chunks
ride the vector lanes, each re-deriving its entry state from an overlap
(reference semantics: ``find/bench.rs:226-348``, pyahocorasick
``find/bench.py:118-123``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile geometry rides the AC staging (stage_cols): 32-sublane state
# planes amortize the serially-dependent per-column chain (same ILP
# lever as the AC kernel).
from stringwars_tpu.ops.ahocorasick import _AC_KSTEP as _KSTEP
from stringwars_tpu.ops.ahocorasick import _AC_LANES as _LANES
from stringwars_tpu.ops.ahocorasick import _AC_SUB as _SUB

MAX_BITS = 64  # up to two u32 words of pattern positions
_W = 32


class ShiftAndSet:
    """Patterns staged as per-word bitplanes + start/final masks.

    Patterns never straddle the 32-bit word boundary: placement packs
    first-fit into word 0 then word 1, so the only cross-word carry a
    shift needs is the architectural bit31 -> bit0 one, and it is always
    masked off by ``mask(byte)`` at non-start positions of word 1 unless
    a pattern legitimately continues there (it never does)."""

    def __init__(self, patterns: list[bytes]):
        if not patterns:
            raise ValueError("need at least one pattern")
        if any(len(p) == 0 for p in patterns):
            raise ValueError("empty patterns not allowed")
        if any(len(p) > _W for p in patterns):
            raise ValueError(f"single pattern longer than {_W} chars")
        total = sum(len(p) for p in patterns)
        if total > MAX_BITS:
            raise ValueError(f"total pattern length {total} exceeds {MAX_BITS}")
        self.patterns = patterns
        self.max_len = max(len(p) for p in patterns)
        # First-fit placement into word-aligned segments.
        chars = np.zeros(2 * _W, np.uint8)
        cursors = [0, _W]
        start_mask = 0
        final_mask = 0
        top = 0
        for p in sorted(patterns, key=len, reverse=True):
            w = 0 if cursors[0] + len(p) <= _W else 1
            start = cursors[w]
            if start + len(p) > (w + 1) * _W:
                raise ValueError("patterns do not pack into two 32-bit words")
            chars[start : start + len(p)] = np.frombuffer(p, np.uint8)
            start_mask |= 1 << start
            final_mask |= 1 << (start + len(p) - 1)
            cursors[w] = start + len(p)
            top = max(top, cursors[w])
        self.n_words = 2 if top > _W else 1
        occupied = 0
        for w in range(self.n_words):
            occupied |= ((1 << (cursors[w] - w * _W)) - 1) << (w * _W)
        # plane[k] bit p = bit k of pattern char p.
        planes = np.zeros((self.n_words, 8), np.uint32)
        for p in range(2 * _W):
            if not (occupied >> p) & 1:
                continue
            for k in range(8):
                if (int(chars[p]) >> k) & 1:
                    planes[p // _W, k] |= np.uint32(1 << (p % _W))
        self.planes = planes
        self.start_mask = start_mask
        self.final_mask = final_mask
        self.occupied = occupied


def _sa_kernel(n_strips: int, overlap: int, n_words: int):
    def kernel(meta_ref, masks_ref, bytes_ref, gpos0_ref, out_ref, state_ref, count_ref):
        strip = pl.program_id(0)

        @pl.when(strip == 0)
        def _():
            state_ref[...] = jnp.zeros((n_words, _SUB, _LANES), jnp.uint32)
            count_ref[...] = jnp.zeros((_SUB, _LANES), jnp.int32)

        n_glob = meta_ref[0]
        limit = meta_ref[1]
        gpos0 = gpos0_ref[...]
        ones = jnp.full((_SUB, _LANES), 0xFFFFFFFF, jnp.uint32)

        def col(k, _):
            byte = bytes_ref[k]  # [SUB, LANES] int32
            # Per-column XOR masks (byte-bit images), shared by all words.
            mns = [
                jnp.where(((byte >> bit) & 1) == 1, jnp.uint32(0), ones)
                for bit in range(8)
            ]
            p = strip * _KSTEP + k
            gpos = gpos0 + p
            valid = (gpos >= 0) & (gpos < n_glob)
            counting = valid & (p >= overlap) & (p < limit)
            hits = jnp.zeros((_SUB, _LANES), jnp.int32)
            for w in range(n_words):
                base = 11 * w
                # Myers-style Eq: mask(byte) = AND over bit k of
                # (plane_k ^ mn_k), limited to occupied bits.
                m = jnp.uint32(masks_ref[base + 10])
                for bit in range(8):
                    m &= jnp.uint32(masks_ref[base + bit]) ^ mns[bit]
                state = ((state_ref[w] << 1) | jnp.uint32(masks_ref[base + 8])) & m
                state = jnp.where(valid, state, state_ref[w])
                state_ref[w] = state
                hits += jax.lax.population_count(
                    state & jnp.uint32(masks_ref[base + 9])
                ).astype(jnp.int32)
            count_ref[...] = count_ref[...] + jnp.where(counting, hits, 0)
            return ()

        jax.lax.fori_loop(0, _KSTEP, col, ())

        @pl.when(strip == n_strips - 1)
        def _():
            out_ref[...] = count_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("overlap", "interpret"))
def _sa_scan(meta, masks, cols, gpos0, overlap: int, interpret: bool = False):
    """cols: int32 [P, 8, 128] byte columns (P multiple of KSTEP);
    masks: i32[11 * n_words] per-word planes+masks (``stage_masks``)."""
    n_strips = cols.shape[0] // _KSTEP
    n_words = masks.shape[0] // 11
    out = pl.pallas_call(
        _sa_kernel(n_strips, overlap, n_words),
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_KSTEP, _SUB, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((_SUB, _LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_SUB, _LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((_SUB, _LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_words, _SUB, _LANES), jnp.uint32),
            pltpu.VMEM((_SUB, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, masks, cols, gpos0)
    return jnp.sum(out, dtype=jnp.int64).astype(jnp.int32)


def stage_masks(sa: ShiftAndSet) -> jax.Array:
    """SMEM operand: per word, 8 bitplanes + start/final/occupied -> i32."""
    vals: list = []
    for w in range(sa.n_words):
        vals += list(sa.planes[w])
        vals += [
            np.uint32((sa.start_mask >> (w * _W)) & 0xFFFFFFFF),
            np.uint32((sa.final_mask >> (w * _W)) & 0xFFFFFFFF),
            np.uint32((sa.occupied >> (w * _W)) & 0xFFFFFFFF),
        ]
    return jnp.asarray(np.asarray(vals, np.uint32).view(np.int32))


def shiftand_count(
    sa: ShiftAndSet, hay, n: int | None = None, *, interpret: bool | None = None
) -> int:
    """Total occurrences of all patterns in ``hay[:n]``."""
    from stringwars_tpu.ops.ahocorasick import stage_cols

    hay_np = np.asarray(hay, np.uint8)
    n = int(hay_np.shape[0]) if n is None else n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cols, gpos0, overlap, limit = stage_cols(hay_np, n, sa.max_len)
    meta = jnp.asarray([n, limit], jnp.int32)
    return int(_sa_scan(meta, stage_masks(sa), cols, gpos0, overlap, bool(interpret)))
