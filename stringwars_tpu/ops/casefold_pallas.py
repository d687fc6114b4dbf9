"""Fused Pallas case fold staging: decode + fold LUT + keys in one kernel.

The staged XLA fold pipeline (``casefold.fold_tokens``) pays ~10
full-array HBM passes; round 4's fused kernel collapsed those into one
pass but still evaluated the fold as an unrolled SMEM rule walk —
O(rules) VPU ops per element (~660 op-units/slab for a ≤0x4FF corpus),
which left German/Russian/multilingual below their reference rows.

Round 5 replaces the walk with **lane dynamic_gather LUTs**
(``ops/lut.py``): per codepoint, TWO table lookups —

- ``T1[cp] = (v0 - cp) & 0xFFFF | length << 16`` where ``v0`` is the
  folded codepoint (or the first expansion char) and ``length`` the fold
  output length 1..3;
- ``T2[cp] = e2 | e3 << 16`` — expansion chars two and three.

Storing a DELTA in T1 makes identity pages all-equal, so the full BMP
dedups to 32 distinct 128-entry pages: corpora ≤ U+04FF use direct
tables (10 gather windows each), anything else in the BMP uses a
two-level page map (4 + 2x32 windows) — ~60-210 vreg-ops per 1024
elements either way, vs ~660-2070 for the walk.

The same gather also absorbs the COMPACTION: round 4 emitted
(dst << 16 | cp) operands for an XLA packed bitonic sort that measured
14 of the German row's 19 ms/iter; now each output slot binary-searches
the group's sorted expansion cumsum in-kernel (5 lane gathers) and picks
its value channel directly, so the kernel's outputs ARE the folded
matrix. Tile layout is (256, 128) — the gather legality envelope is
128-lane windows only (see ops/lut.py).

Covers BMP corpora at token width 32; ``fold_tokens`` remains the
general path and the oracle. Reference: ``normalization/bench.rs:63-77``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stringwars_tpu.ops.lut import lane_lut, replicate8

ROWS = 256
LANES = 128
GROUP = 32  # token width = lanes per group
_DIRECT_MAX = 1280  # <= 10 windows per table: skip the page indirection


def _lig():
    return jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) % GROUP


def _roll_left(x, k, fill):
    r = pltpu.roll(x, LANES - k, axis=1)
    return jnp.where(_lig() < GROUP - k, r, fill)


def _roll_right(x, k, fill):
    r = pltpu.roll(x, k, axis=1)
    return jnp.where(_lig() >= k, r, fill)


def _group_cumsum(v):
    k = 1
    while k < GROUP:
        v = v + _roll_right(v, k, 0)
        k *= 2
    return v


@functools.lru_cache(maxsize=None)
def _fused_tables(max_cp: int):
    """LUT operands for corpora bounded by ``max_cp`` (BMP only).

    Returns ``("direct", T1, T2)`` or ``("paged", PM, PG1, PG2)`` as
    numpy arrays (1-D, 128-padded); pages are 128 codepoints wide and
    deduplicated over the (T1, T2) pair so one page map serves both.
    """
    from stringwars_tpu.ops.casefold import _fold_arrays

    inline, multi, pool = _fold_arrays()
    S = max_cp + 1
    Sp = -(-S // 128) * 128
    cps = np.arange(Sp, dtype=np.int64)
    inl = np.zeros(Sp, np.int64)
    inl[:S] = inline[:S]
    mul = np.zeros(Sp, np.int64)
    mul[:S] = multi[:S]
    is_multi = inl < 0
    length = np.where(is_multi, mul & 31, 1)
    off = mul >> 5
    e1 = pool[np.clip(off, 0, pool.shape[0] - 1)]
    e2 = np.where(length >= 2, pool[np.clip(off + 1, 0, pool.shape[0] - 1)], 0)
    e3 = np.where(length >= 3, pool[np.clip(off + 2, 0, pool.shape[0] - 1)], 0)
    v0 = np.where(is_multi, e1, inl)
    t1 = (((v0 - cps) & 0xFFFF) | (length << 16)).astype(np.int32)
    t2 = (e2 | (e3 << 16)).astype(np.int32)
    # identity padding past S (delta 0, length 1, no expansions)
    t1[S:] = 1 << 16
    t2[S:] = 0
    if Sp <= _DIRECT_MAX:
        return ("direct", t1, t2)
    pair = np.stack([t1.reshape(-1, 128), t2.reshape(-1, 128)], axis=1)
    flat = pair.reshape(pair.shape[0], -1)
    uniq, inverse = np.unique(flat, axis=0, return_inverse=True)
    pm = inverse.astype(np.int32)
    pg = uniq.reshape(-1, 2, 128)
    pg1 = pg[:, 0, :].reshape(-1).astype(np.int32)
    pg2 = pg[:, 1, :].reshape(-1).astype(np.int32)
    pad = lambda a: np.pad(a, (0, (-a.shape[0]) % 128))  # noqa: E731
    return ("paged", pad(pm), pg1, pg2)


def _gather_row(x, idx):
    """Per-element lane gather within each 128-lane row."""
    return jnp.take_along_axis(x, idx, axis=1)


def _make_kernel(mode: str, n_entries: int, n_pm: int, max_exp: int):
    def kernel(*refs):
        if mode == "direct":
            t1_ref, t2_ref, b_ref, len_ref, *out_refs = refs
        else:
            pm_ref, pg1_ref, pg2_ref, b_ref, len_ref, *out_refs = refs
        *plane_refs, cnt_ref = out_refs
        # u8 planes in (4x less stage traffic than i32), widened on-VPU.
        b = b_ref[0].astype(jnp.int32)  # (ROWS, LANES), 32-lane token groups
        lig = _lig()
        valid = lig < len_ref[0].astype(jnp.int32)  # token length (NUL is real)

        # UTF-8 decode at lead positions.
        b1 = _roll_left(b, 1, 0) & 0x3F
        b2 = _roll_left(b, 2, 0) & 0x3F
        b3 = _roll_left(b, 3, 0) & 0x3F
        is_lead = ((b & 0xC0) != 0x80) & valid
        w2 = (b >= 0xC0) & (b < 0xE0)
        w3 = (b >= 0xE0) & (b < 0xF0)
        w4 = b >= 0xF0
        cp = jnp.where(
            w2,
            ((b & 0x1F) << 6) | b1,
            jnp.where(
                w3,
                ((b & 0x0F) << 12) | (b1 << 6) | b2,
                jnp.where(w4, ((b & 0x07) << 18) | (b1 << 12) | (b2 << 6) | b3, b),
            ),
        )
        # Clamp for garbage at continuation lanes (masked off via is_lead,
        # but the gather index must stay in range).
        idx = jnp.clip(cp, 0, n_entries - 1)
        if mode == "direct":
            t1 = lane_lut(t1_ref[...], idx)
            t2 = lane_lut(t2_ref[...], idx)
        else:
            pid = lane_lut(pm_ref[...], jnp.clip(idx >> 7, 0, n_pm - 1))
            pidx = (pid << 7) | (idx & 127)
            t1 = lane_lut(pg1_ref[...], pidx)
            t2 = lane_lut(pg2_ref[...], pidx)
        delta = jax.lax.shift_right_arithmetic(t1 << 16, 16)
        mlen = jax.lax.shift_right_logical(t1, 16)  # fold length 1..3
        v0 = (cp + delta) & 0xFFFF
        v1 = t2 & 0xFFFF
        v2 = jax.lax.shift_right_logical(t2, 16)

        length = jnp.where(is_lead, mlen, 0)
        csum = _group_cumsum(length)
        starts = csum - length

        # In-kernel compaction — replaces the XLA packed bitonic sort that
        # dominated the round-4 pipeline (14 of 19 ms/iter on the German
        # row). For each output slot d of a group, the source lane is the
        # FIRST lane whose inclusive cumsum exceeds d (continuation lanes
        # share their predecessor's cumsum so they can never win); csum is
        # sorted within the group, so a 5-step branchless binary search
        # over lane gathers finds it, then three value gathers pick the
        # expansion channel d - starts[src].
        base = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) - lig
        total = _gather_row(csum, base + (GROUP - 1))
        for q in range(max_exp):
            d = lig + GROUP * q
            rank = jnp.zeros((ROWS, LANES), jnp.int32)
            for bstep in (16, 8, 4, 2, 1):
                probe = rank + (bstep - 1)
                c = _gather_row(csum, base + jnp.minimum(probe, GROUP - 1))
                rank = jnp.where((probe <= GROUP - 1) & (c <= d), rank + bstep, rank)
            src = base + jnp.minimum(rank, GROUP - 1)
            ch = d - _gather_row(starts, src)
            val = jnp.where(
                ch == 0,
                _gather_row(v0, src),
                jnp.where(ch == 1, _gather_row(v1, src), _gather_row(v2, src)),
            )
            plane_refs[q][0] = jnp.where(d < total, val, 0)
        cnt_ref[0] = csum  # group total at each group's LAST lane

    return kernel


@functools.partial(
    jax.jit, static_argnames=("mode", "n_entries", "n_pm", "max_exp", "interpret")
)
def _fold_stage(rows_i32, len_plane, tables, mode, n_entries, n_pm, max_exp, interpret):
    n_t = rows_i32.shape[0]
    spec = pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0))
    tspecs = [pl.BlockSpec((8, t.shape[1]), lambda i: (0, 0)) for t in tables]
    shape = jax.ShapeDtypeStruct(rows_i32.shape, jnp.int32)
    n_out = max_exp + 1
    return pl.pallas_call(
        _make_kernel(mode, n_entries, n_pm, max_exp),
        grid=(n_t,),
        in_specs=[*tspecs, spec, spec],
        out_specs=(spec,) * n_out,
        out_shape=(shape,) * n_out,
        interpret=interpret,
    )(*tables, rows_i32, len_plane)


def fold_tokens_fused(tokens, max_cp: int, *, interpret: bool | None = None):
    """Fused fold for width-32 PaddedTokens over any BMP corpus; returns
    the same ``(folded int32[B, max_exp*W], counts int32[B])`` contract as
    ``fold_tokens`` (falls back to it for non-BMP / other widths)."""
    from stringwars_tpu.ops.casefold import _fold_rules, fold_tokens

    W = int(tokens.data.shape[1])
    *_, max_exp = _fold_rules(max_cp)
    if W != GROUP or max_cp > 0xFFFF:
        return fold_tokens(tokens, max_cp=max_cp)
    max_exp = max(max_exp, 1)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    mode, *tabs = _fused_tables(max_cp)
    n_entries = -(-(max_cp + 1) // 128) * 128
    n_pm = -(-(max_cp + 1) // 128) if mode == "paged" else 1
    tables = tuple(replicate8(t) for t in tabs)

    B = tokens.data.shape[0]
    per_tile = ROWS * LANES // GROUP
    n_t = -(-B // per_tile)
    padded = jnp.pad(tokens.data.astype(jnp.uint8), ((0, n_t * per_tile - B), (0, 0)))
    tiled = padded.reshape(n_t, ROWS, LANES)
    lens = jnp.pad(tokens.lengths.astype(jnp.uint8), (0, n_t * per_tile - B))
    len_plane = jnp.broadcast_to(lens[:, None], (n_t * per_tile, GROUP)).reshape(
        n_t, ROWS, LANES
    )
    planes = _fold_stage(
        tiled, len_plane, tables, mode, n_entries, n_pm, max_exp, bool(interpret)
    )
    csum = planes[-1]
    counts = csum.reshape(n_t * per_tile, GROUP)[:B, GROUP - 1]
    # The kernel already compacted: plane q's 32-lane group holds output
    # slots [32q, 32q+32), dead slots zeroed — concatenation IS the
    # folded matrix (no sort, no mask pass).
    out = jnp.concatenate(
        [p.reshape(n_t * per_tile, GROUP)[:B] for p in planes[:-1]], axis=1
    )
    # Matches fold_tokens' [B, max_exp*W] width for this corpus ceiling
    # (callers only read past counts as zeros, so max_exp<=2 corpora's
    # narrower [B, 2W] is contract-compatible with the [B, 3W] general
    # staged shape).
    return out, counts
