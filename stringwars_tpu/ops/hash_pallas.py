"""Pallas TPU kernel for the XXH64 stripe loop (family K3 fast path).

The jnp formulation leaves the 32-stripe round chain to XLA fusion, which
materializes intermediates between stripes; this kernel keeps the token
block and all eight u32 accumulator lanes VMEM-resident and walks the
stripes in-register — the corpus is read from HBM exactly once.

Grid: one program per batch tile. Block: the stripe-major word matrix
slice ``[W4, B_TILE]`` plus the per-token stripe counts; output is the
four u64 accumulators as ``[8, B_TILE]`` u32 rows (hi/lo interleaved),
consumed by the jnp merge/tail epilogue in ``ops.hash``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F

B_TILE = 4096


def _const_pair(v: int):
    return jnp.uint32(v >> 32), jnp.uint32(v & 0xFFFFFFFF)


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _mul32_wide(a, b):
    mask = jnp.uint32(0xFFFF)
    al, ah = a & mask, a >> 16
    bl, bh = b & mask, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    mid_c = (mid < lh).astype(jnp.uint32)
    lo = ll + (mid << 16)
    lo_c = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + (mid_c << 16) + lo_c
    return hi, lo


def _mul64(ah, al, bh, bl):
    hi, lo = _mul32_wide(al, bl)
    return hi + al * bh + ah * bl, lo


def _rotl64_31(h, l):
    # rotl(x, 31): hi' = (h << 31) | (l >> 1); lo' = (l << 31) | (h >> 1)
    return (h << 31) | (l >> 1), (l << 31) | (h >> 1)


def _round64(ah, al, lh, ll):
    p2h, p2l = _const_pair(_P64_2)
    mh, ml = _mul64(lh, ll, p2h, p2l)
    ah, al = _add64(ah, al, mh, ml)
    ah, al = _rotl64_31(ah, al)
    p1h, p1l = _const_pair(_P64_1)
    return _mul64(ah, al, p1h, p1l)


def _make_kernel(n_stripes: int):
    def kernel(seed_ref, words_ref, nstripes_ref, out_ref):
        seed_hi = seed_ref[0]
        seed_lo = seed_ref[1]
        bt = words_ref.shape[1]

        def bc(vh, vl):
            return (
                jnp.full((bt,), vh, jnp.uint32) + seed_hi * 0,
                jnp.full((bt,), vl, jnp.uint32),
            )

        # acc init: seed + consts (u64 adds with the scalar seed).
        inits = []
        p1h, p1l = _const_pair(_P64_1)
        p2h, p2l = _const_pair(_P64_2)
        z = jnp.zeros((bt,), jnp.uint32)
        sh = z + seed_hi
        sl = z + seed_lo
        s12h, s12l = _add64(sh, sl, *(_const_pair((_P64_1 + _P64_2) & ((1 << 64) - 1))))
        a0 = s12h
        b0 = s12l
        a1, b1 = _add64(sh, sl, z + p2h, z + p2l)
        a2, b2 = sh, sl
        # seed - P1
        negp1 = (-_P64_1) & ((1 << 64) - 1)
        a3, b3 = _add64(sh, sl, *(jnp.uint32(negp1 >> 32), jnp.uint32(negp1 & 0xFFFFFFFF)))
        accs = [a0, b0, a1, b1, a2, b2, a3, b3]

        counts = nstripes_ref[:]
        for s in range(n_stripes):
            active = s < counts
            for i in range(4):
                lh = words_ref[8 * s + 2 * i + 1]
                ll = words_ref[8 * s + 2 * i]
                nh, nl = _round64(accs[2 * i], accs[2 * i + 1], lh, ll)
                accs[2 * i] = jnp.where(active, nh, accs[2 * i])
                accs[2 * i + 1] = jnp.where(active, nl, accs[2 * i + 1])
        for i in range(8):
            out_ref[i] = accs[i]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def xxh64_stripes(words_t: jax.Array, n_stripes_vec: jax.Array, seed_pair: jax.Array, *, interpret: bool = False) -> jax.Array:
    """[8, B] u32 accumulator lanes (hi/lo x4) after all 32-byte stripes.

    ``words_t``: [W4, B] stripe-major words, B a multiple of B_TILE;
    ``n_stripes_vec``: int32[B]; ``seed_pair``: uint32[2] (hi, lo).
    """
    w4, b = words_t.shape
    n_stripes = w4 // 8
    grid = (b // B_TILE,)
    kernel = _make_kernel(n_stripes)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((w4, B_TILE), lambda i, *_: (0, i)),
                pl.BlockSpec((B_TILE,), lambda i, *_: (i,)),
            ],
            out_specs=pl.BlockSpec((8, B_TILE), lambda i, *_: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, b), jnp.uint32),
        interpret=interpret,
    )(seed_pair, words_t, n_stripes_vec.astype(jnp.int32))
