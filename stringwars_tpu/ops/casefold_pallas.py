"""Fused Pallas case fold staging: decode + rules + keys in one kernel.

The staged XLA fold pipeline (``casefold.fold_tokens``) profiles as ~10
full-array HBM passes across its stages on a 32 MB German corpus:
decode+rule-maps 13.3 ms, key/cumsum staging 7.5 ms, compaction sort
only 5.3 ms. This kernel owns 32-byte token rows as 32-lane groups (the
BPE kernel's layout) and emits the per-channel packed sort keys
directly:

- UTF-8 decode at lead positions — next-byte access is 3 masked
  in-group rolls, no (B, W+k) pads;
- the simple-fold delta rules, expansion-length map, and packed e1|e2
  map walk SMEM fully unrolled (corpus-pruned: German is ~17 rules);
- per-token expansion offsets are a 5-step in-group prefix sum;
- outputs are (dst << 16 | folded_cp) per channel plus a counts plane —
  exactly the operands of the packed single-operand ``lax.sort`` that
  finishes the compaction (the one stage XLA already does well).

Covers ``max_exp <= 3`` BMP corpora at token width 32 — i.e. every BMP
corpus (the UCD's only longer folds are astral); ``fold_tokens`` remains
the general path and the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
LANES = 1024
GROUP = 32  # token width = lanes per group
_BIG = 0x7FFF  # dead-slot dst (sorts last; fits the <<16 packing)


def _lig():
    return jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1) % GROUP


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


def _make_kernel(n_simple: int, n_mlen: int, n_e12: int, n_e3: int, emit3: bool):
    def kernel(slo, shi, sd, spm, spr, mlo, mhi, md, elo, ehi, ed,
               e3lo, e3hi, e3d, b_ref, len_ref, *out_refs):
        if emit3:
            p0_ref, p1_ref, p2_ref, cnt_ref = out_refs
        else:
            p0_ref, p1_ref, cnt_ref = out_refs
        b = b_ref[0]  # (SUB, LANES) int32 bytes, 32-lane token groups
        lig = _lig()
        valid = lig < len_ref[0]  # per-token length plane (NUL is real)

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

        def walk(lo_r, hi_r, d_r, count, pm_r=None, pr_r=None):
            if count == 0:
                return jnp.zeros_like(cp)

            def body(r, acc):
                ok = (cp >= lo_r[r]) & (cp <= hi_r[r])
                if pm_r is not None:
                    ok &= (cp & pm_r[r]) == pr_r[r]
                return acc + jnp.where(ok, d_r[r], 0)

            return jax.lax.fori_loop(0, count, body, jnp.zeros_like(cp), unroll=count)

        folded = cp + walk(slo, shi, sd, n_simple, spm, spr)
        mlen = walk(mlo, mhi, md, n_mlen)
        e12 = walk(elo, ehi, ed, n_e12)

        length = jnp.where(is_lead, jnp.where(mlen > 0, mlen, 1), 0)
        csum = _group_cumsum(length)
        starts = csum - length

        v0 = jnp.where(mlen > 0, e12 & 0xFFFF, folded) & 0xFFFF
        v1 = (e12 >> 16) & 0xFFFF
        k0 = jnp.where(length >= 1, starts, _BIG)
        k1 = jnp.where(length >= 2, starts + 1, _BIG)
        p0_ref[0] = (k0 << 16) | v0
        p1_ref[0] = (k1 << 16) | v1
        if emit3:
            v2 = walk(e3lo, e3hi, e3d, n_e3) & 0xFFFF
            k2 = jnp.where(length >= 3, starts + 2, _BIG)
            p2_ref[0] = (k2 << 16) | v2
        cnt_ref[0] = csum  # group total at each group's LAST lane

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_simple", "n_mlen", "n_e12", "n_e3", "emit3", "interpret")
)
def _fold_stage(rows_i32, len_plane, rule_arrs, n_simple, n_mlen, n_e12, n_e3,
                emit3, interpret):
    n_t = rows_i32.shape[0]
    spec = pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct(rows_i32.shape, jnp.int32)
    n_out = 4 if emit3 else 3
    return pl.pallas_call(
        _make_kernel(n_simple, n_mlen, n_e12, n_e3, emit3),
        grid=(n_t,),
        in_specs=[smem] * 14 + [spec, spec],
        out_specs=(spec,) * n_out,
        out_shape=(shape,) * n_out,
        interpret=interpret,
    )(*rule_arrs, rows_i32, len_plane)


def fold_tokens_fused(tokens, max_cp: int, *, interpret: bool | None = None):
    """Fused fold for width-32 PaddedTokens over any BMP corpus
    (``max_exp <= 3``); returns the same
    ``(folded int32[B, max_exp*W], counts int32[B])`` contract as
    ``fold_tokens`` (falls back to it for non-BMP / other widths)."""
    from stringwars_tpu.ops.casefold import _fold_rules, fold_tokens

    W = int(tokens.data.shape[1])
    simple, mlen_r, e12_r, e3_r, max_exp = _fold_rules(max_cp)
    if W != GROUP or max_exp > 3 or max_cp > 0xFFFF:
        return fold_tokens(tokens, max_cp=max_cp)
    emit3 = max_exp >= 3
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B = tokens.data.shape[0]
    per_tile = SUB * LANES // GROUP
    n_t = -(-B // per_tile)
    data = tokens.data.astype(jnp.int32)
    padded = jnp.pad(data, ((0, n_t * per_tile - B), (0, 0)))
    tiled = padded.reshape(n_t, SUB, LANES)
    lens = jnp.pad(tokens.lengths.astype(jnp.int32), (0, n_t * per_tile - B))
    len_plane = jnp.broadcast_to(lens[:, None], (n_t * per_tile, GROUP)).reshape(
        n_t, SUB, LANES
    )
    # never hand pallas a zero-length operand (Mosaic rejects them and the
    # interpreter divides by zero); the kernel skips a walk whose static
    # count is 0, so 1-element dummies are never read
    def _arrs(r, *fields):
        if r.count == 0:
            return (jnp.zeros(1, jnp.int32),) * len(fields)
        return tuple(jnp.asarray(getattr(r, f)) for f in fields)

    rule_arrs = (
        *_arrs(simple, "lo", "hi", "delta", "pmask", "par"),
        *_arrs(mlen_r, "lo", "hi", "delta"),
        *_arrs(e12_r, "lo", "hi", "delta"),
        *_arrs(e3_r, "lo", "hi", "delta"),
    )
    planes = _fold_stage(
        tiled, len_plane, rule_arrs, simple.count, mlen_r.count, e12_r.count,
        e3_r.count, emit3, bool(interpret),
    )
    csum = planes[-1]
    chans = [p.reshape(n_t * per_tile, GROUP)[:B] for p in planes[:-1]]
    counts = csum.reshape(n_t * per_tile, GROUP)[:B, GROUP - 1]
    packed = jax.lax.sort(jnp.concatenate(chans, axis=1), dimension=1)
    out_w = len(chans) * GROUP
    live = jnp.arange(out_w, dtype=jnp.int32)[None, :] < counts[:, None]
    out = jnp.where(live, packed & jnp.int32(0xFFFF), 0)
    # Matches fold_tokens' [B, max_exp*W] width for this corpus ceiling
    # (callers only read past counts as zeros, so max_exp<=2 corpora's
    # narrower [B, 2W] is contract-compatible with the [B, 3W] general
    # staged shape).
    return out, counts
