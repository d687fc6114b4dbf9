"""Gotoh affine-gap alignment scores in Pallas (family K5 fast path).

The XLA anti-diagonal scan (``ops/similarity.py``) pays a fixed
per-diagonal dispatch cost — 511 sequential [B, L+1] steps measure
~78 µs each regardless of batch, capping NW-affine at ~13 GCUPS. This
kernel runs the whole wavefront inside one Pallas program per 1024-pair
tile with all three DP matrices' live diagonals resident in VMEM
(reference engines: ``szs::NeedlemanWunschScores`` /
``SmithWatermanScores``, ``similarities/bench.rs:348-362``).

Layout and tricks:

- Pairs fill the (sublane, lane) = (8, 128) vector; the diagonal index
  ``i`` (rows of ``a``) is the major axis. Each of M/Ix/Iy keeps TWO
  diagonal slabs (d-1, d-2) in a ``[2, A+2, SUB, LANES]`` VMEM scratch,
  ping-ponged by diagonal parity (d and d-2 share a slot, so the d-2
  read happens before the same-slot write).
- **Shifts are free**: slab row ``r`` holds diagonal entry ``i = r-1``
  and row 0 is a permanent -BIG sentinel, so reading ``X[i-1]`` is the
  same slab at row offset 0 instead of 1 — no data movement.
- **The anti-diagonal of ``b`` is a dynamic slice**: ``b`` is staged
  REVERSED and padded so column char ``b[d-i-1]`` for the whole i-range
  is one ``pl.ds(A + L - d, A+1)`` read — no gathers (TPU byte gathers
  measure near-scalar).
- Boundary conditions emerge from the sentinel algebra: the only seed is
  M(0,0) = 0; gap openers on row/column 0 follow from the recurrences
  over -BIG neighbors (verified against the brute-force Gotoh oracle).

Scoring conventions match ``ops/similarity.py`` (match/mismatch
substitution, first gap char costs ``gap_open``, each further char
``gap_extend``); ``local=True`` gives Smith-Waterman (floor at 0, score
= max over all cells).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
LANES = 128
TILE = SUB * LANES

# A two-cells-per-vreg-lane int16 packing (16 sublanes, 2048 pairs/tile)
# was prototyped and DELETED: an empirical op probe on the v5e Mosaic
# toolchain shows int16 vectors legalize ONLY add/sub — no maxsi, no
# cmpi, no shifts, no muls — and a DP wavefront without max cannot be
# expressed. Revisit only if a future libtpu adds 16-bit VPU lowering.
_NEG = -(1 << 20)


def _neg_for(dtype):
    return jnp.array(_NEG, dtype)


def _subst_for(a_chars, bc, match: int, mismatch: int, dtype):
    """Per-cell substitution score: compare + select."""
    return jnp.where(a_chars == bc, jnp.array(match, dtype), jnp.array(mismatch, dtype))


def _make_kernel(A: int, L: int, match: int, mismatch: int, go: int, ge: int, local: bool, dtype, sub: int, uniform_full: bool = False):
    AP1 = A + 1
    P0 = A  # reversed-b pad so the slice start P0 + L - d stays >= 0
    n_d = A + L + 1
    # Uniform-length batches (every pair alen == A, blen == L) extract the
    # global score straight from the final diagonal slab — the per-step
    # fin select+write disappears from the loop.
    slab_out = uniform_full and not local

    def kernel(a_ref, rb_hbm, alen_ref, blen_ref, out_ref, *scratch):
        # Scratch: [m, x, y, (fin unless slab_out), rb, sem] — the fin
        # plane is not allocated at all on the slab-out path (VMEM headroom).
        if slab_out:
            m_ref, x_ref, y_ref, rb_ref, sem = scratch
            fin_ref = None
        else:
            m_ref, x_ref, y_ref, fin_ref, rb_ref, sem = scratch
        # rb stays in HBM (a full-window block would be double-buffered by
        # the pipeline and blow the VMEM budget); one DMA per tile.
        copy = pltpu.make_async_copy(rb_hbm.at[pl.program_id(0)], rb_ref, sem)
        copy.start()
        neg = _neg_for(dtype)
        m_ref[...] = jnp.full((2, AP1 + 1, sub, LANES), neg, dtype)
        x_ref[...] = jnp.full((2, AP1 + 1, sub, LANES), neg, dtype)
        y_ref[...] = jnp.full((2, AP1 + 1, sub, LANES), neg, dtype)
        copy.wait()
        # Seed M(0,0) = 0 on the diag-0 (parity 0) slab, entry i=0 -> row 1;
        # the d=0 step then peels out of the loop entirely (all its other
        # cells are decayed sentinels the init already represents).
        m_ref[0, 1] = jnp.zeros((sub, LANES), dtype)

        alen = alen_ref[0]
        blen = blen_ref[0]
        dfin = alen + blen
        if not slab_out:
            fin_ref[...] = jnp.full((AP1, sub, LANES), neg, dtype)
            # The peeled d=0 step's only fin contribution: empty x empty
            # pairs (dfin == 0) score M(0,0) = 0 at row i = 0.
            fin_ref[0] = jnp.where(dfin == 0, jnp.array(0, dtype), neg)
        a_chars = a_ref[0]  # [AP1, sub, LANES]; row i = a[i-1], row 0 sentinel
        ii = jax.lax.broadcasted_iota(jnp.int32, (AP1, sub, LANES), 0)

        # No per-cell validity masking: the true DP rectangle (i <= alen,
        # j <= blen) only reads cells with smaller i and j, so it is closed
        # under the recurrence; out-of-rectangle "fake" cells decay from
        # sentinels/real cells (pads never match) and are excluded at
        # extraction (global) or bounded by the true max (local) — see the
        # linear kernel's note. This removes ~8 vector ops per row per step.
        def step(d, _):
            par = jax.lax.rem(d, 2)
            cur = pl.ds(par, 1)
            prev = pl.ds(1 - par, 1)
            # d-2 shares the parity slot with d (read before overwrite).
            m2s = m_ref[cur, pl.ds(0, AP1)][0]  # (i-1, j-1) of diag d-2
            x2s = x_ref[cur, pl.ds(0, AP1)][0]
            y2s = y_ref[cur, pl.ds(0, AP1)][0]
            m1s = m_ref[prev, pl.ds(0, AP1)][0]  # (i-1, j) of diag d-1
            x1s = x_ref[prev, pl.ds(0, AP1)][0]
            m1u = m_ref[prev, pl.ds(1, AP1)][0]  # (i, j-1) of diag d-1
            y1u = y_ref[prev, pl.ds(1, AP1)][0]

            bc = rb_ref[pl.ds(P0 + L - d + 1, AP1)]  # b[j-1] along the diagonal
            subst = _subst_for(a_chars, bc, match, mismatch, dtype)

            m_new = jnp.maximum(jnp.maximum(m2s, x2s), y2s) + subst
            if local:
                m_new = jnp.maximum(m_new, jnp.array(0, dtype))
            x_new = jnp.maximum(m1s + jnp.array(go, dtype), x1s + jnp.array(ge, dtype))
            y_new = jnp.maximum(m1u + jnp.array(go, dtype), y1u + jnp.array(ge, dtype))

            if local:
                # Fake (out-of-rectangle) cells decay from real ones and the
                # floor, so max(best) over ALL cells equals the true SW max.
                best = jnp.maximum(jnp.maximum(m_new, x_new), y_new)
                fin_ref[...] = jnp.maximum(fin_ref[...], best)
            elif not slab_out:
                best = jnp.maximum(jnp.maximum(m_new, x_new), y_new)
                fin_ref[...] = jnp.where(d == dfin, best, fin_ref[...])

            m_ref[cur, pl.ds(1, AP1)] = m_new[None]
            x_ref[cur, pl.ds(1, AP1)] = x_new[None]
            y_ref[cur, pl.ds(1, AP1)] = y_new[None]
            return ()

        jax.lax.fori_loop(1, n_d, step, ())
        # Reductions widen to i32 first (Mosaic: no int16 reductions).
        if local:
            out_ref[0] = jnp.max(fin_ref[...].astype(jnp.int32), axis=0)
        elif slab_out:
            # Cell (A, L) lives on diag A+L (the final step) at slab row AP1.
            par = (A + L) % 2
            best = jnp.maximum(
                jnp.maximum(m_ref[par, AP1], x_ref[par, AP1]), y_ref[par, AP1]
            )
            out_ref[0] = best.astype(jnp.int32)
        else:
            out_ref[0] = jnp.max(
                jnp.where(ii == alen, fin_ref[...].astype(jnp.int32), jnp.int32(_NEG)),
                axis=0,
            )

    return kernel


def _make_kernel_linear(A: int, L: int, match: int, mismatch: int, g: int, local: bool, dtype, sub: int, uniform_full: bool = False):
    """Single-matrix wavefront for linear gaps (go == ge): H[i,j] =
    max(H[i-1,j-1]+sub, H[i-1,j]+g, H[i,j-1]+g) — one slab pair instead
    of three, ~3× fewer VMEM ops per cell than the Gotoh form.

    No per-cell validity masking (the round-3 op-diet): the recurrence
    only reads cells with smaller i and j, so the true DP rectangle
    (i <= alen, j <= blen) never sees an out-of-rectangle value. "Fake"
    cells beyond the rectangle start from -BIG sentinels or decay from
    real cells through mismatches/gaps (pads never match: a-pad = -2,
    b-pad = -1, real bytes >= 0), so for the local score they are
    bounded by the true max (and the floor keeps them >= 0 = the empty
    alignment), and for the global score the extraction selects only
    row i == alen written at d == alen + blen. This halves the vector
    ops per row per step (~15 -> ~7)."""
    AP1 = A + 1
    P0 = A
    n_d = A + L + 1
    slab_out = uniform_full and not local  # see _make_kernel

    def kernel(a_ref, rb_hbm, alen_ref, blen_ref, out_ref, *scratch):
        if slab_out:
            m_ref, rb_ref, sem = scratch
            fin_ref = None
        else:
            m_ref, fin_ref, rb_ref, sem = scratch
        copy = pltpu.make_async_copy(rb_hbm.at[pl.program_id(0)], rb_ref, sem)
        copy.start()
        neg = _neg_for(dtype)
        m_ref[...] = jnp.full((2, AP1 + 1, sub, LANES), neg, dtype)
        copy.wait()
        # Seed M(0,0) = 0 and peel the d=0 step (see _make_kernel).
        m_ref[0, 1] = jnp.zeros((sub, LANES), dtype)

        alen = alen_ref[0]
        blen = blen_ref[0]
        dfin = alen + blen
        if not slab_out:
            fin_ref[...] = jnp.full((AP1, sub, LANES), neg, dtype)
            fin_ref[0] = jnp.where(dfin == 0, jnp.array(0, dtype), neg)
        a_chars = a_ref[0]
        ii = jax.lax.broadcasted_iota(jnp.int32, (AP1, sub, LANES), 0)

        def step(d, _):
            par = jax.lax.rem(d, 2)
            cur = pl.ds(par, 1)
            prev = pl.ds(1 - par, 1)
            m2s = m_ref[cur, pl.ds(0, AP1)][0]  # (i-1, j-1) of diag d-2
            m1s = m_ref[prev, pl.ds(0, AP1)][0]  # (i-1, j) of diag d-1
            m1u = m_ref[prev, pl.ds(1, AP1)][0]  # (i, j-1) of diag d-1

            bc = rb_ref[pl.ds(P0 + L - d + 1, AP1)]
            subst = _subst_for(a_chars, bc, match, mismatch, dtype)

            m_new = jnp.maximum(
                m2s + subst, jnp.maximum(m1s, m1u) + jnp.array(g, dtype)
            )
            if local:
                m_new = jnp.maximum(m_new, jnp.array(0, dtype))
                fin_ref[...] = jnp.maximum(fin_ref[...], m_new)
            elif not slab_out:
                fin_ref[...] = jnp.where(d == dfin, m_new, fin_ref[...])

            m_ref[cur, pl.ds(1, AP1)] = m_new[None]
            return ()

        jax.lax.fori_loop(1, n_d, step, ())
        if local:
            out_ref[0] = jnp.max(fin_ref[...].astype(jnp.int32), axis=0)
        elif slab_out:
            par = (A + L) % 2
            out_ref[0] = m_ref[par, AP1].astype(jnp.int32)
        else:
            out_ref[0] = jnp.max(
                jnp.where(ii == alen, fin_ref[...].astype(jnp.int32), jnp.int32(_NEG)),
                axis=0,
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("A", "L", "match", "mismatch", "go", "ge", "local", "interpret", "uniform_full"),
)
def _affine(a_chars, rb_pad, alen, blen, A: int, L: int, match: int, mismatch: int, go: int, ge: int, local: bool, interpret: bool, uniform_full: bool = False):
    n_bt = a_chars.shape[0]
    dtype = a_chars.dtype
    sub = a_chars.shape[2]
    meta_spec = pl.BlockSpec((1, sub, LANES), lambda bt: (bt, 0, 0))
    if go == ge:
        kernel = _make_kernel_linear(A, L, match, mismatch, go, local, dtype, sub, uniform_full)
        slabs = 1
    else:
        kernel = _make_kernel(A, L, match, mismatch, go, ge, local, dtype, sub, uniform_full)
        slabs = 3
    slab_out = uniform_full and not local
    fin_scratch = [] if slab_out else [pltpu.VMEM((A + 1, sub, LANES), dtype)]
    return pl.pallas_call(
        kernel,
        grid=(n_bt,),
        in_specs=[
            pl.BlockSpec((1, A + 1, sub, LANES), lambda bt: (bt, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            meta_spec,
            meta_spec,
        ],
        out_specs=meta_spec,
        out_shape=jax.ShapeDtypeStruct((n_bt, sub, LANES), jnp.int32),
        scratch_shapes=[
            *[pltpu.VMEM((2, A + 2, sub, LANES), dtype) for _ in range(slabs)],
            *fin_scratch,  # per-row extraction plane (skipped on slab-out)
            pltpu.VMEM((rb_pad.shape[1], sub, LANES), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_chars, rb_pad, alen, blen)


class AffineBatch:
    """Pairs staged for the Gotoh kernel (host-side tiling + reversal)."""

    def __init__(self, a: np.ndarray, b: np.ndarray, a_len: np.ndarray, b_len: np.ndarray):
        dt = np.int32
        sub = SUB
        tile_pairs = sub * LANES
        a = np.asarray(a, dt)
        b = np.asarray(b, dt)
        B, A = a.shape
        L = b.shape[1]
        self.count = B
        self.A, self.L = A, L
        n_bt = max(1, -(-B // tile_pairs))
        Bp = n_bt * tile_pairs

        def tile(v2d, fill):
            out = np.full((Bp, v2d.shape[1]), fill, dt)
            out[:B] = v2d
            return out.reshape(n_bt, tile_pairs, -1).transpose(0, 2, 1).reshape(
                n_bt, -1, sub, LANES
            )

        # a row i-1 -> slab row i; row 0 = sentinel that never matches.
        a_shift = np.full((B, A + 1), -2, dt)
        a_shift[:, 1:] = np.where(
            np.arange(A)[None, :] < np.asarray(a_len)[:, None], a, dt(-2)
        )
        # b reversed with sentinel pads: slice start P0 + L - d + 1, P0 = A.
        RP = 2 * A + L + 2
        rb = np.full((B, RP), -1, dt)
        valid_b = np.arange(L)[None, :] < np.asarray(b_len)[:, None]
        rb[:, A + 1 : A + 1 + L] = np.where(valid_b, b, dt(-1))[:, ::-1]

        self.a_chars = jnp.asarray(tile(a_shift, -2))
        self.rb_pad = jnp.asarray(tile(rb, -1))

        def meta(v):
            out = np.zeros(Bp, np.int32)
            out[:B] = v
            return jnp.asarray(out.reshape(n_bt, sub, LANES))

        self.alen = meta(np.asarray(a_len, np.int32))
        self.blen = meta(np.asarray(b_len, np.int32))
        self._np_alen = np.asarray(a_len, np.int64)
        self._np_blen = np.asarray(b_len, np.int64)
        # Static hint: every real pair fills its padded rectangle, so the
        # kernel reads the global score off the final diagonal slab (pad
        # pairs in partial tiles produce garbage that staging discards).
        self.uniform_full = bool(
            B > 0 and (self._np_alen == A).all() and (self._np_blen == L).all()
        )

    def cells(self) -> int:
        return int((self._np_alen * self._np_blen).sum())


def affine_scores(
    batch: AffineBatch,
    match: int = 2,
    mismatch: int = -1,
    gap_open: int = -5,
    gap_extend: int = -1,
    *,
    local: bool = False,
    interpret: bool | None = None,
) -> np.ndarray:
    """NW (or SW with ``local=True``) affine-gap score per pair -> int32[count].

    The reversed-b staging flips the pad window per d; scoring matches
    ``ops/similarity.nw_score_affine`` / ``sw_score_affine`` exactly
    (tested against both and the brute-force Gotoh oracle)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _affine(
        batch.a_chars,
        batch.rb_pad,
        batch.alen,
        batch.blen,
        batch.A,
        batch.L,
        match,
        mismatch,
        gap_open,
        gap_extend,
        local,
        interpret,
        uniform_full=batch.uniform_full,
    )
    flat = np.asarray(out).reshape(-1)[: batch.count]
    if local:
        # SW floors at 0 (empty alignment); sequences shorter than any
        # positive-scoring alignment still report 0.
        return np.maximum(flat, 0)
    return flat


def affine_from_tokens(a_tokens: list[bytes], b_tokens: list[bytes]) -> AffineBatch:
    """Byte-level staging from token lists."""
    B = len(a_tokens)
    A = max((len(t) for t in a_tokens), default=1)
    L = max((len(t) for t in b_tokens), default=1)
    a = np.zeros((B, max(A, 1)), np.int32)
    b = np.zeros((B, max(L, 1)), np.int32)
    a_len = np.zeros(B, np.int32)
    b_len = np.zeros(B, np.int32)
    for i, (x, y) in enumerate(zip(a_tokens, b_tokens)):
        a[i, : len(x)] = np.frombuffer(x, np.uint8)
        b[i, : len(y)] = np.frombuffer(y, np.uint8)
        a_len[i], b_len[i] = len(x), len(y)
    return AffineBatch(a, b, a_len, b_len)
