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
every end position). Total pattern length is capped at 32 chars (one u32
lane word); bigger sets fall back to the DFA scan (``ac_count``).

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

_SUB, _LANES = 8, 128
_KSTEP = 512  # byte columns per grid step

MAX_BITS = 32  # one u32 word of pattern positions


class ShiftAndSet:
    """Patterns staged as bitplanes + start/final masks."""

    def __init__(self, patterns: list[bytes]):
        if not patterns:
            raise ValueError("need at least one pattern")
        if any(len(p) == 0 for p in patterns):
            raise ValueError("empty patterns not allowed")
        total = sum(len(p) for p in patterns)
        if total > MAX_BITS:
            raise ValueError(f"total pattern length {total} exceeds {MAX_BITS}")
        self.patterns = patterns
        self.max_len = max(len(p) for p in patterns)
        chars = np.zeros(MAX_BITS, np.uint8)
        start = 0
        start_mask = 0
        final_mask = 0
        for p in patterns:
            chars[start : start + len(p)] = np.frombuffer(p, np.uint8)
            start_mask |= 1 << start
            final_mask |= 1 << (start + len(p) - 1)
            start += len(p)
        occupied = (1 << start) - 1 if start < 64 else 0xFFFFFFFF
        # plane[k] bit p = bit k of pattern char p; unoccupied positions
        # get an impossible sentinel via the occupied mask below.
        planes = np.zeros(8, np.uint64)
        for p in range(start):
            for k in range(8):
                if (int(chars[p]) >> k) & 1:
                    planes[k] |= np.uint64(1 << p)
        self.planes = jnp.asarray(planes.astype(np.uint32))
        self.start_mask = jnp.uint32(start_mask)
        self.final_mask = jnp.uint32(final_mask)
        self.occupied = jnp.uint32(occupied & 0xFFFFFFFF)


def _sa_kernel(n_strips: int, overlap: int):
    def kernel(meta_ref, masks_ref, bytes_ref, gpos0_ref, out_ref, state_ref, count_ref):
        strip = pl.program_id(0)

        @pl.when(strip == 0)
        def _():
            state_ref[...] = jnp.zeros((_SUB, _LANES), jnp.uint32)
            count_ref[...] = jnp.zeros((_SUB, _LANES), jnp.int32)

        n_glob = meta_ref[0]
        limit = meta_ref[1]
        start_mask = jnp.uint32(masks_ref[8])
        final_mask = jnp.uint32(masks_ref[9])
        occupied = jnp.uint32(masks_ref[10])
        gpos0 = gpos0_ref[...]
        ones = jnp.full((_SUB, _LANES), 0xFFFFFFFF, jnp.uint32)

        def col(k, _):
            byte = bytes_ref[k]  # [SUB, LANES] int32
            # Myers-style Eq: mask(byte) = AND over bit k of
            # (plane_k ^ (byte-bit-k ? 0 : ~0)), limited to occupied bits.
            m = occupied
            for bit in range(8):
                mn = jnp.where(((byte >> bit) & 1) == 1, jnp.uint32(0), ones)
                m &= jnp.uint32(masks_ref[bit]) ^ mn
            p = strip * _KSTEP + k
            gpos = gpos0 + p
            valid = (gpos >= 0) & (gpos < n_glob)
            state = ((state_ref[...] << 1) | start_mask) & m
            state = jnp.where(valid, state, state_ref[...])
            state_ref[...] = state
            hits = jax.lax.population_count(state & final_mask).astype(jnp.int32)
            count_ref[...] = count_ref[...] + jnp.where(
                valid & (p >= overlap) & (p < limit), hits, 0
            )
            return ()

        jax.lax.fori_loop(0, _KSTEP, col, ())

        @pl.when(strip == n_strips - 1)
        def _():
            out_ref[...] = count_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("overlap", "interpret"))
def _sa_scan(meta, masks, cols, gpos0, overlap: int, interpret: bool = False):
    """cols: int32 [P, 8, 128] byte columns (P multiple of KSTEP)."""
    n_strips = cols.shape[0] // _KSTEP
    out = pl.pallas_call(
        _sa_kernel(n_strips, overlap),
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
            pltpu.VMEM((_SUB, _LANES), jnp.uint32),
            pltpu.VMEM((_SUB, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, masks, cols, gpos0)
    return jnp.sum(out, dtype=jnp.int64).astype(jnp.int32)


def stage_masks(sa: ShiftAndSet) -> jax.Array:
    """SMEM operand: 8 bitplanes + start/final/occupied masks as i32[11]."""
    vals = list(np.asarray(sa.planes, np.uint32)) + [
        np.uint32(sa.start_mask),
        np.uint32(sa.final_mask),
        np.uint32(sa.occupied),
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
