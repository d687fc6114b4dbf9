"""Pallas TPU kernel for exact substring counting (family K1 fast path).

XLA cannot fuse chains of *shifted* elementwise compares on TPU (each
offset slice materializes a full haystack copy), so the compares run here
against a VMEM-resident block where shifts are free static slices.

Packed-word formulation (reference semantics: all-matches counting,
``find/bench.rs:88-93``): a window starting at byte ``p = 4*q + o`` is
verified with ``K = ceil((m + o) / 4)`` u32 word compares against the
needle's offset-``o`` image (``ops/find.pack_needle`` stages the 4 shifted
images with valid-byte masks; inactive words have ``mask == word == 0`` so
``(w & mask) == word`` is vacuously true). Each lane therefore tests 4
haystack bytes per op, and the k-outer / offset-inner loop reads each
shifted VMEM slice once for all four byte offsets — ~3 ops per (k, o)
pair per *word*, vs 3 ops per *byte* per needle byte for the naive scan.

Layout: the haystack is staged once into ROWS interleaved word rows
``[ROWS, chunkw + HALOW]`` (row r = words [r*chunkw, (r+1)*chunkw +
HALOW)), so blocks are tile-shaped i32; the grid walks column panels, each
kernel instance reading its panel plus the next panel's head (a second
BlockSpec) to cover windows that straddle panel edges. Needle words +
masks ride the scalar-prefetch channel, keeping needles dynamic (no
recompile per needle); ``find_count_cycle`` scans a whole needle batch in
ONE dispatch, amortizing host dispatch overhead exactly like the
reference's needle-cycling hot loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile geometry: ROWS x PANELW i32 blocks. ROWS stays at the native i32
# sublane count — the unrolled k-loop keeps tens of [ROWS, PANELW]
# temporaries live, and Mosaic's scoped-VMEM stack (16 MB) OOMs past
# ~8 KB/lane-column (ROWS=64 allocated 61 MB and failed to compile).
ROWS = 8
PANELW = 4096  # u32 words per grid step per row (16 KiB of haystack)
HALOW = 128  # halo words (512 B) >= needle capacity words + 1


def stage_words(hay: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """[ROWS, chunkw + HALOW] overlapping i32-word view of hay[:n]."""
    chunkw = (n + 4 * ROWS - 1) // (4 * ROWS)
    chunkw = (chunkw + PANELW - 1) // PANELW * PANELW
    buf = np.zeros(4 * (ROWS * chunkw + HALOW), np.uint8)
    buf[:n] = hay[:n]
    words = buf.view("<u4")
    rows = np.lib.stride_tricks.sliding_window_view(words, chunkw + HALOW)[::chunkw][:ROWS]
    return np.ascontiguousarray(rows).view(np.int32), chunkw


def _make_kernel(k_words: int, with_last: bool):
    def kernel(words4_ref, masks4_ref, meta_ref, panel_ref, head_ref, *rest):
        """Count matches whose window starts inside this panel."""
        if with_last:
            out_ref, last_ref, scratch = rest
        else:
            out_ref, scratch = rest
            last_ref = None
        scratch[:, :PANELW] = panel_ref[...]
        scratch[:, PANELW:] = head_ref[...]
        n = meta_ref[0]
        m = meta_ref[1]
        chunkw = meta_ref[2]
        i = pl.program_id(0)

        cands = [jnp.ones((ROWS, PANELW), dtype=jnp.bool_) for _ in range(4)]
        for k in range(k_words):
            w = scratch[:, k : k + PANELW]
            for o in range(4):
                # Inactive words (mask == word == 0) pass vacuously.
                cands[o] &= (w & masks4_ref[o, k]) == words4_ref[o, k]

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANELW), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, PANELW), 1)
        gw = row_ids * chunkw + i * PANELW + col_ids  # global word index
        count = jnp.int32(0)
        best = jnp.int32(-1)
        for o in range(4):
            # Window start p = 4*gw + o must satisfy p <= n - m
            # (jnp // is floor division, correct for negative n - m - o).
            hit = cands[o] & (gw <= (n - m - o) // 4)
            count += jnp.sum(hit.astype(jnp.int32))
            if with_last:
                best = jnp.maximum(best, jnp.max(jnp.where(hit, 4 * gw + o, -1)))

        # Single shared (8, 128) accumulator block (grid runs sequentially).
        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        ) == 0

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros((8, 128), jnp.int32)
            if with_last:
                last_ref[...] = jnp.full((8, 128), -1, jnp.int32)

        out_ref[...] = out_ref[...] + jnp.where(one_hot, count, 0)
        if with_last:
            last_ref[...] = jnp.maximum(last_ref[...], jnp.where(one_hot, best, -1))

    return kernel


def _count_impl(rows, words4, masks4, meta, k_words: int, interpret: bool, with_last: bool = False):
    grid = ((rows.shape[1] - HALOW) // PANELW,)
    acc_spec = pl.BlockSpec((8, 128), lambda i, *_: (0, 0))
    acc_shape = jax.ShapeDtypeStruct((8, 128), jnp.int32)
    outs = pl.pallas_call(
        _make_kernel(k_words, with_last),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ROWS, PANELW), lambda i, *_: (0, i)),
                pl.BlockSpec((ROWS, HALOW), lambda i, *_: (0, (i + 1) * (PANELW // HALOW))),
            ],
            out_specs=(acc_spec, acc_spec) if with_last else acc_spec,
            scratch_shapes=[pltpu.VMEM((ROWS, PANELW + HALOW), jnp.int32)],
        ),
        out_shape=(acc_shape, acc_shape) if with_last else acc_shape,
        interpret=interpret,
    )(words4, masks4, meta, rows, rows)
    if with_last:
        return outs[0][0, 0], outs[1][0, 0]
    return outs[0, 0]


@functools.partial(jax.jit, static_argnames=("k_words", "interpret"))
def _count(rows, words4, masks4, meta, k_words: int, interpret: bool = False):
    return _count_impl(rows, words4, masks4, meta, k_words, interpret)


@functools.partial(jax.jit, static_argnames=("k_words", "interpret"))
def _count_last(rows, words4, masks4, meta, k_words: int, interpret: bool = False):
    return _count_impl(rows, words4, masks4, meta, k_words, interpret, with_last=True)


@functools.partial(jax.jit, static_argnames=("k_words", "interpret"))
def _count_batch(rows, words4_b, masks4_b, meta_b, k_words: int, interpret: bool = False):
    """Counts for a whole needle batch in one dispatch (lax.scan over
    needles; the haystack stays resident in HBM across the batch)."""

    def body(carry, inp):
        w4, m4, meta = inp
        return carry, _count_impl(rows, w4, m4, meta, k_words, interpret)

    _, counts = jax.lax.scan(body, jnp.int32(0), (words4_b, masks4_b, meta_b))
    return counts


class StagedHaystack:
    """Haystack staged once for repeated Pallas find calls."""

    def __init__(self, hay: np.ndarray, n: int | None = None):
        hay = np.asarray(hay, np.uint8)
        self.n = int(hay.shape[0]) if n is None else n
        rows, self.chunkw = stage_words(hay, self.n)
        self.rows = jax.device_put(rows)


def _needle_operands(staged: StagedHaystack, needle):
    from stringwars_tpu.ops.find import PackedNeedle, pack_needle

    if isinstance(needle, bytes):
        needle = pack_needle(needle, 16)
    assert isinstance(needle, PackedNeedle)
    if needle.capacity + 1 > HALOW:
        raise ValueError(
            f"needle capacity {needle.capacity} words exceeds the panel halo ({HALOW - 1})"
        )
    words4 = jax.lax.bitcast_convert_type(jnp.asarray(needle.words), jnp.int32)
    masks4 = jax.lax.bitcast_convert_type(jnp.asarray(needle.masks), jnp.int32)
    meta = jnp.asarray([staged.n, int(needle.length), staged.chunkw], jnp.int32)
    return words4, masks4, meta, needle.capacity


def find_count_pallas(staged: StagedHaystack, needle, *, interpret: bool | None = None) -> int:
    """All-matches count of a PackedNeedle over a staged haystack."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    words4, masks4, meta, k_words = _needle_operands(staged, needle)
    return int(_count(staged.rows, words4, masks4, meta, k_words, interpret))


def rfind_pallas(staged: StagedHaystack, needle, *, interpret: bool | None = None):
    """Backward-search semantics: (all-matches count, LAST match offset).

    A distinct compiled program from the forward count (the kernel also
    reduces the max matching window start), mirroring the reference's
    ``rfind`` loop (``find/bench.rs:144-219``) — on a data-parallel scan
    the match set is the same, the deliverable is last-match-first.
    Returns (count, last_offset) with last_offset == -1 when no match.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    words4, masks4, meta, k_words = _needle_operands(staged, needle)
    count, last = _count_last(staged.rows, words4, masks4, meta, k_words, interpret)
    return int(count), int(last)


class NeedleBatch:
    """A batch of same-capacity needles staged for one-dispatch scanning."""

    def __init__(self, staged: StagedHaystack, needles):
        ops = [_needle_operands(staged, nd) for nd in needles]
        caps = {k for *_, k in ops}
        if len(caps) != 1:
            raise ValueError(f"needles must share one capacity bucket, got {sorted(caps)}")
        (self.k_words,) = caps
        self.words4 = jnp.stack([w for w, *_ in ops])
        self.masks4 = jnp.stack([m for _, m, *_ in ops])
        self.meta = jnp.stack([t for _, _, t, _ in ops])
        self.size = len(ops)


def find_count_cycle(staged: StagedHaystack, batch: NeedleBatch, *, interpret: bool | None = None):
    """Per-needle all-matches counts for the whole batch, one dispatch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _count_batch(
        staged.rows, batch.words4, batch.masks4, batch.meta, batch.k_words, interpret
    )


# ---------------------------------------------------------------------------
# Codepoint-window count: the general (non-ASCII) uncased-find form (K10)
# ---------------------------------------------------------------------------
#
# The XLA formulation (ops/casefold._window_count) pays one full-stream
# materialization per needle position (m unfused shifted slices measured
# 7.9 GB/s on the 8-cp row); here the i32 codepoint stream is staged once
# into overlapping rows and each grid step compares all m offsets against
# a VMEM-resident panel — one HBM pass total. Needle codepoints ride the
# scalar-prefetch channel (dynamic, no recompile per needle).
# Reference semantics: ``normalization/bench.rs:334-351`` (uncased search
# counts all matches of the folded needle in the folded haystack).

CP_PANEL = 4096  # i32 codepoints per grid step per row
CP_HALO = 128  # supports needles up to 129 folded codepoints


def stage_cp_rows(cps: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """[ROWS, chunk + CP_HALO] overlapping view of the cp stream."""
    chunk = (n + ROWS - 1) // ROWS
    chunk = (chunk + CP_PANEL - 1) // CP_PANEL * CP_PANEL
    buf = np.full(ROWS * chunk + CP_HALO, -1, np.int32)  # -1 matches no cp
    buf[:n] = cps[:n]
    rows = np.lib.stride_tricks.sliding_window_view(buf, chunk + CP_HALO)[::chunk][:ROWS]
    return np.ascontiguousarray(rows), chunk


def _make_cp_kernel(m: int):
    def kernel(needle_ref, meta_ref, panel_ref, head_ref, out_ref, scratch):
        scratch[:, :CP_PANEL] = panel_ref[...]
        scratch[:, CP_PANEL:] = head_ref[...]
        n = meta_ref[0]
        chunk = meta_ref[1]
        i = pl.program_id(0)

        cand = jnp.ones((ROWS, CP_PANEL), dtype=jnp.bool_)
        for j in range(m):
            cand &= scratch[:, j : j + CP_PANEL] == needle_ref[j]

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, CP_PANEL), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, CP_PANEL), 1)
        gp = row_ids * chunk + i * CP_PANEL + col_ids  # global cp position
        count = jnp.sum((cand & (gp <= n - m)).astype(jnp.int32))

        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        ) == 0

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros((8, 128), jnp.int32)

        out_ref[...] = out_ref[...] + jnp.where(one_hot, count, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def cp_window_count(rows, needle, meta, m: int, interpret: bool = False):
    """All-matches count of an m-cp needle over staged cp rows.

    ``rows``: ``stage_cp_rows`` output; ``needle``: int32[>=m];
    ``meta``: int32[2] = (n, chunk)."""
    grid = ((rows.shape[1] - CP_HALO) // CP_PANEL,)
    out = pl.pallas_call(
        _make_cp_kernel(m),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ROWS, CP_PANEL), lambda i, *_: (0, i)),
                pl.BlockSpec((ROWS, CP_HALO), lambda i, *_: (0, (i + 1) * (CP_PANEL // CP_HALO))),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0)),
            scratch_shapes=[pltpu.VMEM((ROWS, CP_PANEL + CP_HALO), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=interpret,
    )(needle, meta, rows, rows)
    return out[0, 0]
