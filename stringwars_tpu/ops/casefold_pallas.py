"""Fused expand-and-compact Pallas engine: case fold + decomposition (K10).

One kernel owns the whole "map each element to 1..N outputs and compact"
shape shared by the full case fold and NFD/NFKD decomposition:

1. (optional) UTF-8 decode at lead positions via masked in-group rolls;
2. the 1→N map as TWO lane-gather LUT lookups (``ops/lut.py``):
   ``T1[cp] = (v0 - cp) & 0xFFFF | length << 16`` (v0 = mapped codepoint
   or first expansion char; storing a DELTA makes identity pages
   all-equal so the page map dedups), ``T2[cp] = e2 | e3 << 16``;
3. expansion offsets via a log2(group)-step in-group prefix sum;
4. COMPACTION in-kernel: for each output slot d of a group, the source
   lane is the first lane whose inclusive cumsum exceeds d (continuation
   lanes share their predecessor's cumsum so they can never win); csum
   is sorted within the group, so a branchless binary search over lane
   gathers finds it, then value gathers pick channel d - starts[src].

Round 4 emitted (dst << 16 | cp) operands for an XLA packed bitonic sort
instead of step 4 — that sort measured 14 of the German fold row's
19 ms/iter — and evaluated step 2 as an unrolled SMEM rule walk
(O(rules) VPU ops/element), which left German/Russian/multilingual fold
below their reference rows. With the LUT + in-kernel compaction the
kernel's outputs ARE the folded/decomposed matrix; measured fold rows
(TPU v5e, chained): German 3.86 / Russian 3.04 / Greek 3.09 /
multilingual 3.04 GB/s vs reference 2.59 / 2.20 / 1.00 (Zen5).

Tile layout is (256, 128); the gather legality envelope is 128-lane
windows only (see ops/lut.py). Covers BMP corpora with expansion <= 3;
the staged XLA pipelines (``casefold.fold_tokens``,
``normalize.decompose_rows``) remain the general path and the oracle.

Reference: ``normalization/bench.rs:63-141``.
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
GROUP = 32  # fold token width = lanes per group
_DIRECT_MAX = 1280  # <= 10 windows per table: skip the page indirection
MAX_EXP = 4  # engine ceiling (= UAX#15's NFD max): beyond takes the staged path


def _lig(group):
    return jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) % group


def _roll_left(x, k, fill, group):
    r = pltpu.roll(x, LANES - k, axis=1)
    return jnp.where(_lig(group) < group - k, r, fill)


def _roll_right(x, k, fill, group):
    r = pltpu.roll(x, k, axis=1)
    return jnp.where(_lig(group) >= k, r, fill)


def _group_cumsum(v, group):
    k = 1
    while k < group:
        v = v + _roll_right(v, k, 0, group)
        k *= 2
    return v


def prepare_tables(t1: np.ndarray, *more: np.ndarray):
    """Stage dense int32 tables (T1 [, T2, T3]) for the kernel: direct
    windows for small tables, a shared deduplicated 128-entry page map
    otherwise. Returns ``(mode, n_entries, n_pm, arrays)``."""
    S = t1.shape[0]
    Sp = -(-S // 128) * 128
    pad1 = np.full(Sp, 1 << 16, np.int32)  # identity, length 1
    pad1[:S] = t1
    padded = [pad1]
    for t in more:
        p = np.zeros(Sp, np.int32)
        p[:S] = t
        padded.append(p)
    if Sp <= _DIRECT_MAX:
        return ("direct", Sp, 1, tuple(padded))
    pair = np.stack([p.reshape(-1, 128) for p in padded], axis=1)
    flat = pair.reshape(pair.shape[0], -1)
    uniq, inverse = np.unique(flat, axis=0, return_inverse=True)
    pm = inverse.astype(np.int32)
    pg = uniq.reshape(-1, len(padded), 128)
    pad = lambda a: np.pad(a, (0, (-a.shape[0]) % 128))  # noqa: E731
    pgs = tuple(pg[:, k, :].reshape(-1).astype(np.int32) for k in range(len(padded)))
    return ("paged", Sp, Sp // 128, (pad(pm), *pgs))


@functools.lru_cache(maxsize=None)
def _fold_tables(max_cp: int):
    """Fold (T1, T2) for corpora bounded by ``max_cp`` (BMP only)."""
    from stringwars_tpu.ops.casefold import _fold_arrays

    inline, multi, pool = _fold_arrays()
    S = max_cp + 1
    cps = np.arange(S, dtype=np.int64)
    inl = inline[:S].astype(np.int64)
    mul = multi[:S].astype(np.int64)
    is_multi = inl < 0
    length = np.where(is_multi, mul & 31, 1)
    off = mul >> 5
    e1 = pool[np.clip(off, 0, pool.shape[0] - 1)]
    e2 = np.where(length >= 2, pool[np.clip(off + 1, 0, pool.shape[0] - 1)], 0)
    e3 = np.where(length >= 3, pool[np.clip(off + 2, 0, pool.shape[0] - 1)], 0)
    v0 = np.where(is_multi, e1, inl)
    t1 = (((v0 - cps) & 0xFFFF) | (length << 16)).astype(np.int32)
    t2 = (e2 | (e3 << 16)).astype(np.int32)
    return prepare_tables(t1, t2)


def _gather_row(x, idx):
    """Per-element lane gather within each 128-lane row."""
    return jnp.take_along_axis(x, idx, axis=1)


def _make_kernel(mode: str, n_entries: int, n_pm: int, n_tab: int, max_exp: int,
                 group: int, utf8: bool):
    def kernel(*refs):
        if mode == "direct":
            *t_refs, b_ref, len_ref = refs[: n_tab + 2]
            out_refs = refs[n_tab + 2:]
        else:
            pm_ref, *t_refs = refs[: n_tab + 1]
            b_ref, len_ref = refs[n_tab + 1: n_tab + 3]
            out_refs = refs[n_tab + 3:]
        *plane_refs, cnt_ref = out_refs
        b = b_ref[0].astype(jnp.int32)  # (ROWS, LANES), group-lane tokens
        lig = _lig(group)
        valid = lig < len_ref[0].astype(jnp.int32)  # token length (NUL is real)

        if utf8:
            # UTF-8 decode at lead positions.
            b1 = _roll_left(b, 1, 0, group) & 0x3F
            b2 = _roll_left(b, 2, 0, group) & 0x3F
            b3 = _roll_left(b, 3, 0, group) & 0x3F
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
        else:
            cp = b
            is_lead = valid
        # Clamp for garbage at continuation lanes (masked off via is_lead,
        # but the gather index must stay in range).
        idx = jnp.clip(cp, 0, n_entries - 1)
        if mode == "direct":
            ts = [lane_lut(r[...], idx) for r in t_refs]
        else:
            pid = lane_lut(pm_ref[...], jnp.clip(idx >> 7, 0, n_pm - 1))
            pidx = (pid << 7) | (idx & 127)
            ts = [lane_lut(r[...], pidx) for r in t_refs]
        t1 = ts[0]
        t2 = ts[1] if n_tab >= 2 else jnp.zeros_like(t1)
        delta = jax.lax.shift_right_arithmetic(t1 << 16, 16)
        mlen = jax.lax.shift_right_logical(t1, 16)  # map length 1..MAX_EXP
        chan_vals = [
            (cp + delta) & 0xFFFF,
            t2 & 0xFFFF,
            jax.lax.shift_right_logical(t2, 16),
        ]
        if max_exp >= 4:
            t3 = ts[2] if n_tab >= 3 else jnp.zeros_like(t1)
            chan_vals.append(t3 & 0xFFFF)

        length = jnp.where(is_lead, mlen, 0)
        csum = _group_cumsum(length, group)
        starts = csum - length

        # In-kernel compaction (see module docstring): binary-search the
        # sorted group cumsum per output slot, then gather the channel.
        base = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) - lig
        total = _gather_row(csum, base + (group - 1))
        for q in range(max_exp):
            d = lig + group * q
            rank = jnp.zeros((ROWS, LANES), jnp.int32)
            bstep = group
            while bstep > 1:
                bstep //= 2
                probe = rank + (bstep - 1)
                c = _gather_row(csum, base + jnp.minimum(probe, group - 1))
                rank = jnp.where((probe <= group - 1) & (c <= d), rank + bstep, rank)
            src = base + jnp.minimum(rank, group - 1)
            ch = d - _gather_row(starts, src)
            val = _gather_row(chan_vals[0], src)
            for c in range(1, max_exp):
                val = jnp.where(ch == c, _gather_row(chan_vals[c], src), val)
            plane_refs[q][0] = jnp.where(d < total, val, 0)
        cnt_ref[0] = csum  # group total at each group's LAST lane

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mode", "n_entries", "n_pm", "max_exp", "group", "utf8", "interpret"),
)
def _expand_stage(tiles, len_plane, tables, mode, n_entries, n_pm, max_exp, group,
                  utf8, interpret):
    n_t = tiles.shape[0]
    spec = pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0))
    tspecs = [pl.BlockSpec((8, t.shape[1]), lambda i: (0, 0)) for t in tables]
    shape = jax.ShapeDtypeStruct(tiles.shape, jnp.int32)
    n_out = max_exp + 1
    n_tab = len(tables) - (0 if mode == "direct" else 1)
    return pl.pallas_call(
        _make_kernel(mode, n_entries, n_pm, n_tab, max_exp, group, utf8),
        grid=(n_t,),
        in_specs=[*tspecs, spec, spec],
        out_specs=(spec,) * n_out,
        out_shape=(shape,) * n_out,
        interpret=interpret,
    )(*tables, tiles, len_plane)


def expand_compact_rows(data, lengths, staged_tables, max_exp: int, group: int,
                        utf8: bool, interpret: bool) -> tuple[jax.Array, jax.Array]:
    """Run the engine over [B, group] rows: returns
    ``(out int32[B, max_exp*group], counts int32[B])``; ``staged_tables``
    is a ``prepare_tables`` result."""
    mode, n_entries, n_pm, tabs = staged_tables
    tables = tuple(replicate8(t) for t in tabs)
    B = data.shape[0]
    per_tile = ROWS * LANES // group
    n_t = -(-B // per_tile)
    dt = jnp.uint8 if utf8 else jnp.int32
    padded = jnp.pad(data.astype(dt), ((0, n_t * per_tile - B), (0, 0)))
    tiled = padded.reshape(n_t, ROWS, LANES)
    lens = jnp.pad(lengths.astype(jnp.uint8), (0, n_t * per_tile - B))
    len_plane = jnp.broadcast_to(lens[:, None], (n_t * per_tile, group)).reshape(
        n_t, ROWS, LANES
    )
    planes = _expand_stage(
        tiled, len_plane, tables, mode, n_entries, n_pm, max_exp, group, utf8,
        interpret,
    )
    csum = planes[-1]
    counts = csum.reshape(n_t * per_tile, group)[:B, group - 1]
    # The kernel already compacted: plane q's group lanes hold output
    # slots [group*q, group*(q+1)), dead slots zeroed — concatenation IS
    # the output matrix (no sort, no mask pass).
    out = jnp.concatenate(
        [p.reshape(n_t * per_tile, group)[:B] for p in planes[:-1]], axis=1
    )
    return out, counts


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
    # Matches fold_tokens' [B, max_exp*W] width for this corpus ceiling
    # (callers only read past counts as zeros, so max_exp<=2 corpora's
    # narrower [B, 2W] is contract-compatible with the [B, 3W] general
    # staged shape).
    return expand_compact_rows(
        tokens.data, tokens.lengths, _fold_tables(max_cp), max_exp, GROUP,
        True, bool(interpret),
    )
