"""Pallas TPU kernel for exact substring counting (family K1 fast path).

XLA cannot fuse chains of *shifted* elementwise compares on TPU (each
offset slice materializes a full haystack copy), so the m byte-compares
run here against a VMEM-resident block where shifts are free static
slices.

Layout: the haystack is staged once into 32 interleaved rows
``[32, chunk + HALO]`` (row r = bytes [r*chunk, (r+1)*chunk + HALO)), so
blocks are tile-shaped u8; the grid walks column panels, each kernel
instance reading its panel plus the next panel's head (a second BlockSpec)
to cover windows that straddle panel edges. Needle bytes + masks ride the
scalar-prefetch channel, keeping needles dynamic (no recompile per
needle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32
HALO = 128  # >= max needle length (61) rounded to lanes
PANEL = 4096  # columns per grid step


def stage_rows(hay: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """[32, chunk + HALO] overlapping row view of hay[:n] (zero-padded)."""
    chunk = (n + ROWS - 1) // ROWS
    chunk = (chunk + PANEL - 1) // PANEL * PANEL
    buf = np.zeros(ROWS * chunk + HALO, np.uint8)
    buf[:n] = hay[:n]
    rows = np.lib.stride_tricks.sliding_window_view(buf, chunk + HALO)[::chunk][:ROWS]
    return np.ascontiguousarray(rows), chunk


def _make_kernel(max_m: int):
    def kernel(needle_ref, mask_ref, meta_ref, panel_ref, head_ref, out_ref, scratch):
        """Count matches with window starts inside this panel."""
        # i8 vector compares are unsupported by Mosaic on this target;
        # stage the window as i32.
        scratch[:, :PANEL] = panel_ref[...].astype(jnp.int32)
        scratch[:, PANEL:] = head_ref[...].astype(jnp.int32)
        n = meta_ref[0]
        m = meta_ref[1]
        chunk = meta_ref[2]
        i = pl.program_id(0)
        acc = jnp.ones((ROWS, PANEL), dtype=jnp.bool_)
        for j in range(max_m):
            nb = needle_ref[j]
            mb = mask_ref[j]
            ok = (scratch[:, j : j + PANEL] == nb.astype(jnp.int32)) | (mb == 0)
            acc &= ok
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANEL), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANEL), 1)
        gpos = row_ids * chunk + i * PANEL + col_ids
        in_chunk = (i * PANEL + col_ids) < chunk  # window belongs to this row
        valid = in_chunk & (gpos <= n - m)
        count = jnp.sum((acc & valid).astype(jnp.int32))

        # Single shared (8, 128) accumulator block (grid runs sequentially).
        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros((8, 128), jnp.int32)

        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        ) == 0
        out_ref[...] = out_ref[...] + jnp.where(one_hot, count, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "max_m", "interpret"))
def _count(rows, needle_bytes, needle_mask, meta, chunk: int, max_m: int, interpret: bool = False):
    total_cols = rows.shape[1] - HALO
    grid = (total_cols // PANEL,)
    partials = pl.pallas_call(
        _make_kernel(max_m),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ROWS, PANEL), lambda i, *_: (0, i)),
                pl.BlockSpec((ROWS, HALO), lambda i, *_: (0, (i + 1) * (PANEL // HALO))),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0)),
            scratch_shapes=[pltpu.VMEM((ROWS, PANEL + HALO), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=interpret,
    )(needle_bytes, needle_mask, meta, rows, rows)
    return partials[0, 0]


class StagedHaystack:
    """Haystack staged once for repeated Pallas find calls."""

    def __init__(self, hay: np.ndarray, n: int | None = None):
        hay = np.asarray(hay, np.uint8)
        self.n = int(hay.shape[0]) if n is None else n
        rows, self.chunk = stage_rows(hay, self.n)
        self.rows = jax.device_put(rows)


def find_count_pallas(staged: StagedHaystack, needle, *, interpret: bool | None = None) -> int:
    """All-matches count of a PackedNeedle over a staged haystack."""
    from stringwars_tpu.ops.find import PackedNeedle

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(needle, bytes):
        from stringwars_tpu.ops.find import pack_needle

        needle = pack_needle(needle, 16)
    # Offset-0 byte image + mask, truncated to the kernel's window.
    words = np.asarray(needle.words[0])
    masks = np.asarray(needle.masks[0])
    max_m = min(4 * words.shape[0] - 3, HALO - 3)
    if int(needle.length) > max_m:
        raise ValueError(
            f"needle of {int(needle.length)} bytes exceeds the Pallas panel "
            f"window ({max_m} bytes); matches would be overcounted"
        )
    nb = np.zeros(max_m, np.uint32)
    mb = np.zeros(max_m, np.uint32)
    for j in range(max_m):
        nb[j] = (int(words[j // 4]) >> (8 * (j % 4))) & 0xFF
        mb[j] = (int(masks[j // 4]) >> (8 * (j % 4))) & 0xFF
    meta = np.array([staged.n, int(needle.length), staged.chunk], np.int32)
    return int(
        _count(
            staged.rows,
            jnp.asarray(nb),
            jnp.asarray(mb),
            jnp.asarray(meta),
            staged.chunk,
            max_m,
            interpret,
        )
    )
