"""In-kernel vector table lookups via the VPU lane gather (K9/K10/K12).

Round-2 systems finding #4 ("u8 table gathers are near-scalar") holds for
XLA-level ``jnp.take`` — but INSIDE a Pallas kernel this toolchain lowers
2-D ``jnp.take_along_axis(x, idx, axis=1)`` to ``tpu.dynamic_gather``
along the lane axis: a true vector shuffle, one op per 128-entry window.
That turns every O(rules) compare-walk lookup (fold rule maps, TR29
break-class maps, NFD decomposition maps — ``ops/rulemap.py``) into
O(table/128) gathers: ~90-rule fold walks (~700 lane-ops/element) become
~10-20 ops/element.

Two layers:

- ``lane_lut(table_row, idx)`` — in-kernel helper: ``table_row`` is a
  ``(1, T)`` VMEM ref/array (T a multiple of 128), ``idx`` any
  ``(R, 128)`` int32 tile with values in ``[0, T)``; returns the gathered
  tile. Windows beyond the first fold in with one select each.
- ``lut_map(values, table)`` — standalone jitted op: tiles a flat int
  array into ``(R, 128)`` blocks and runs the gather kernel; the CPU path
  (and conformance oracle) is plain ``jnp.take``.

Legality envelope on this v5e toolchain (probed on-chip 2026-08-20):
only the LANE gather (axis 1) with EXACTLY 128-lane windows compiles —
the sublane form (axis 0) and 1024-wide windows both crash the compile
helper, and the in-kernel (1,128)->(R,128) table broadcast is rejected
("Invalid input layout") for any R, so tables ride in pre-replicated to
8 sublanes. Measured rates (64 MB i32 streams, chained protocol):
256-entry LUT 67.6 G lookups/s (HBM-bound), 1280-entry 31.3 G, vs the
90-rule range walk at 3.54 G and the XLA-level gather at ~0.1 G.

Reference workloads: ``memory/bench.rs:110-175`` (LUT translate),
``normalization/bench.rs:58-141``, ``tokenization/bench.rs:78-456``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 128  # lane-gather window width (one vreg row)
_BLOCK_R = 512  # sublanes per grid block: (512, 128) i32 = 256 KB


def lane_lut(table8: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather ``table8[0, idx]`` with lane shuffles (in-kernel helper).

    ``table8``: (8, T) int32 — the 1-D table REPLICATED across the 8
    sublanes host-side (Mosaic rejects the in-kernel (1,128)->(8,128)
    broadcast with "Invalid input layout", so the copies ride in with the
    operand). T % 128 == 0. ``idx``: (R, 128) int32 in [0, T),
    R % 8 == 0. One dynamic_gather per 128-entry window per 8-sublane
    slab + one select per window past the first.
    """
    R = idx.shape[0]
    assert R % 8 == 0, "lane_lut wants sublane-slab-aligned tiles"
    n_win = table8.shape[1] // WINDOW
    i7 = jax.lax.bitwise_and(idx, WINDOW - 1)
    win = jax.lax.shift_right_logical(idx, 7) if n_win > 1 else None
    tws = [
        jax.lax.slice(table8, (0, w * WINDOW), (8, (w + 1) * WINDOW))
        for w in range(n_win)
    ]
    slabs = []
    for s in range(R // 8):
        i_s = jax.lax.slice(i7, (s * 8, 0), (s * 8 + 8, WINDOW))
        out = None
        w_s = None
        if n_win > 1:
            w_s = jax.lax.slice(win, (s * 8, 0), (s * 8 + 8, WINDOW))
        for w in range(n_win):
            g = jnp.take_along_axis(tws[w], i_s, axis=1)
            out = g if out is None else jnp.where(w_s == w, g, out)
        slabs.append(out)
    return slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs, axis=0)


def paged_lut_tables(table: np.ndarray, page_bits: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Compress a sparse dense table into (page_map, pages) for two-level
    in-kernel lookup: ``value(cp) = pages[page_map[cp >> page_bits] <<
    page_bits | (cp & mask)]``. Identical pages are deduplicated, so e.g.
    a 64 K-entry fold table with ~20 distinct 256-entry pages costs a
    ~256-entry gather plus a ~5 K-entry gather instead of 512 windows.

    Returns int32 arrays padded to multiples of 128 lanes.
    """
    t = np.asarray(table, np.int32)
    page = 1 << page_bits
    n_pages = -(-t.shape[0] // page)
    padded = np.zeros(n_pages * page, np.int32)
    padded[: t.shape[0]] = t
    view = padded.reshape(n_pages, page)
    uniq, inverse = np.unique(view, axis=0, return_inverse=True)
    page_map = inverse.astype(np.int32)
    pages = uniq.reshape(-1).astype(np.int32)
    pad = lambda a: np.pad(a, (0, (-a.shape[0]) % WINDOW))  # noqa: E731
    return pad(page_map), pad(pages)


def paged_lane_lut(
    page_map8: jax.Array, pages8: jax.Array, idx: jax.Array, page_bits: int = 8
) -> jax.Array:
    """Two-level in-kernel lookup over ``paged_lut_tables`` outputs."""
    hi = jax.lax.shift_right_logical(idx, page_bits)
    lo = jax.lax.bitwise_and(idx, (1 << page_bits) - 1)
    pid = lane_lut(page_map8, hi)
    return lane_lut(pages8, (pid << page_bits) | lo)


def replicate8(table) -> jnp.ndarray:
    """Host-side helper: 1-D table -> (8, T128) sublane-replicated i32."""
    t = jnp.asarray(table, jnp.int32)
    T = t.shape[0]
    Tp = -(-T // WINDOW) * WINDOW
    row = jnp.pad(t, (0, Tp - T))
    return jnp.broadcast_to(row[None, :], (8, Tp))


# ---------------------------------------------------------------------------
# Standalone op: flat int array -> table[values]
# ---------------------------------------------------------------------------


def _lut_kernel(table8_ref, x_ref, out_ref):
    out_ref[...] = lane_lut(table8_ref[...], x_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lut_call(table8, x2d, interpret: bool):
    grid = (x2d.shape[0] // _BLOCK_R,)
    return pl.pallas_call(
        _lut_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, table8.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((_BLOCK_R, WINDOW), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_R, WINDOW), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int32),
        interpret=interpret,
    )(table8, x2d)


def lut_map(values: jax.Array, table, *, interpret: bool | None = None) -> jax.Array:
    """``table[values]`` for any-shape int array; lane-gather kernel on
    TPU, plain ``jnp.take`` elsewhere (the conformance oracle)."""
    shape = values.shape
    v = values.astype(jnp.int32)
    table_arr = jnp.asarray(table, jnp.int32)
    if interpret is None:
        if jax.default_backend() != "tpu":
            return jnp.take(table_arr, v).reshape(shape)
        interpret = False
    row = replicate8(table_arr)
    flat = v.reshape(-1)
    n = flat.shape[0]
    per = _BLOCK_R * WINDOW
    blocks = max(1, -(-n // per))
    x2d = jnp.pad(flat, (0, blocks * per - n)).reshape(blocks * _BLOCK_R, WINDOW)
    out = _lut_call(row, x2d, interpret)
    return out.reshape(-1)[:n].reshape(shape)
