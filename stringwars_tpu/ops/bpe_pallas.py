"""Fused Pallas BPE encoder: the whole merge loop in one kernel (K-BPE).

The XLA encode loop (``ops/bpe.py``) re-streams the [B, W] id matrix
through HBM for every merge iteration (~15 x ~40 ms at 1 M words) and
re-evaluates the rule-map lookup as a separate Pallas dispatch per
iteration. Here ONE kernel owns a tile of rows for the entire loop:

- Rows are lanes: a (8, 1024) int32 tile holds 512 width-16 pretokens
  (16 consecutive lanes per row). All scans are 4 masked ``pltpu.roll``
  log-steps within the 16-lane group; rows never leave registers/VMEM.
- The merge table lives in SMEM as sorted equality rules (key ->
  (rank+1) << 16 | new_id), walked by a ``fori_loop`` — the same
  gather-free lookup as ``rulemap``, amortized to one pass per loop
  iteration with zero HBM traffic.
- The merge rule stays the SOUND per-row global minimum (all
  occurrences of each row's best rank per iteration, overlap runs
  resolved left-to-right by run parity — exactly ``ops/bpe.py``).
  Windowed local-minimum variants were analyzed and rejected: a
  rank-DECREASING chain of spawned pairs can walk in from arbitrary
  distance and pre-empt a locally-minimal merge, so any fixed window
  diverges from the oracle on adversarial tables.
- Each tile's ``while_loop`` exits at quiescence, so finished tiles
  stop paying the rule walk.

Output ids stay in place with -1 holes; the caller compacts once
(the same post-loop stable sort the XLA path uses).
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
GROUP = 16  # default pretoken group width (16 or 32 consecutive lanes)
_INF = 0x7FFFFFFF  # python int: pallas kernels may not capture array constants


def _lane_in_group(group):
    return jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1) % group


def _roll_right(x, k, fill, group):
    """Within-group shift toward higher lanes: out[j] = x[j-k], fill at
    the group's first k lanes."""
    r = pltpu.roll(x, k, axis=1)
    return jnp.where(_lane_in_group(group) >= k, r, fill)


def _roll_left(x, k, fill, group):
    """Within-group shift toward lower lanes: out[j] = x[j+k]."""
    r = pltpu.roll(x, LANES - k, axis=1)  # cyclic: -k == LANES - k
    return jnp.where(_lane_in_group(group) < group - k, r, fill)


def _next_alive(ids, alive, group):
    """(value, found) of the nearest alive lane strictly right of j
    (within the lane group)."""
    v = ids
    f = alive
    k = 1
    while k < group:
        vr = _roll_left(v, k, 0, group)
        fr = _roll_left(f, k, jnp.int32(0), group)
        v = jnp.where(f > 0, v, vr)
        f = f | fr
        k *= 2
    # v/f now hold "nearest alive at >= j"; shift once for strict right.
    return _roll_left(v, 1, 0, group), _roll_left(f, 1, jnp.int32(0), group)


def _prev_value(x, alive, init, group):
    """Value of x at the nearest alive lane strictly left of j."""
    v = jnp.where(alive > 0, x, init)
    f = alive
    k = 1
    while k < group:
        vl = _roll_right(v, k, init, group)
        fl = _roll_right(f, k, jnp.int32(0), group)
        v = jnp.where(f > 0, v, vl)
        f = f | fl
        k *= 2
    return _roll_right(v, 1, init, group)


def _make_kernel(n_rules: int, max_iters: int, group: int):
    def kernel(lo_ref, hi_ref, d_ref, ids_ref, out_ref):
        ids0 = ids_ref[0]  # (SUB, LANES)

        def rank_lookup(keys):
            def body(r, acc):
                ok = (keys >= lo_ref[r]) & (keys <= hi_ref[r])
                return acc + jnp.where(ok, d_ref[r], 0)

            # Full unroll (Mosaic supports only unroll=1 or =num_steps):
            # overlaps the per-rule SMEM scalar loads with the vector
            # compares — serialized loads dominate the rolled loop.
            packed = jax.lax.fori_loop(
                0, n_rules, body, jnp.zeros_like(keys), unroll=n_rules
            )
            hit = packed > 0
            rank = jnp.where(hit, packed >> 16, _INF)
            new_id = packed & jnp.int32(0xFFFF)
            return rank, new_id

        def step(state):
            ids, _changed, it = state
            alive = (ids >= 0).astype(jnp.int32)
            nxt, has_nxt = _next_alive(ids, alive, group)
            keys = (ids << 16) | (nxt & jnp.int32(0xFFFF))
            rank, new_id = rank_lookup(keys)
            valid = (alive > 0) & (has_nxt > 0)
            r = jnp.where(valid, rank, _INF)

            # Per-row global minimum: suffix min-reduce within the 16-lane
            # group (masked left-shifts), the group-start lane then holds
            # the full-group min; broadcast it via binary-decomposition
            # rolls (lane j reads lane j - (j % 16)).
            gmin = r
            k = 1
            while k < group:
                gmin = jnp.minimum(gmin, _roll_left(gmin, k, _INF, group))
                k *= 2
            lig = _lane_in_group(group)
            k = group // 2
            while k >= 1:
                gmin = jnp.where((lig & k) != 0, pltpu.roll(gmin, k, axis=1), gmin)
                k //= 2
            m = valid & (r == gmin) & (gmin < _INF)

            # Left-to-right overlap runs over alive-adjacent matches (all
            # matches share one pair value): dead lanes are identity,
            # alive non-matches reset, matches increment; odd 1-based run
            # positions merge.
            mult = jnp.where(alive > 0, jnp.where(m, 1, 0), 1)
            add = jnp.where((alive > 0) & m, 1, 0)
            # Hillis-Steele over linear-function composition h = own ∘
            # earlier: h(x) = pm_own * (qm_e * x + qa_e) + pa_own.
            pm, pa = mult, add
            k = 1
            while k < group:
                qm = _roll_right(pm, k, 1, group)
                qa = _roll_right(pa, k, 0, group)
                pm, pa = pm * qm, pm * qa + pa
                k *= 2
            runlen = pa
            do = m & ((runlen & 1) == 1)

            prev_do = _prev_value(do.astype(jnp.int32), alive, jnp.int32(0), group)
            eaten = (alive > 0) & (prev_do == 1)

            ids2 = jnp.where(do, new_id, ids)
            ids2 = jnp.where(eaten, jnp.int32(-1), ids2)
            return ids2, jnp.any(do), it + 1

        def cond(state):
            return state[1] & (state[2] < max_iters)

        ids, _, _ = jax.lax.while_loop(
            cond, step, (ids0, jnp.bool_(True), jnp.int32(0))
        )
        out_ref[0] = ids

    return kernel


@functools.partial(jax.jit, static_argnames=("n_rules", "max_iters", "interpret", "group"))
def _bpe_tiles(ids_tiled, lo, hi, d, n_rules: int, max_iters: int, interpret: bool, group: int):
    grid = (ids_tiled.shape[0],)
    spec = pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0))
    return pl.pallas_call(
        _make_kernel(n_rules, max_iters, group),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(ids_tiled.shape, jnp.int32),
        interpret=interpret,
    )(lo, hi, d, ids_tiled)


@functools.partial(jax.jit, static_argnames=("n_rules", "max_iters", "interpret", "W", "group"))
def _encode_fused(ids, counts, lo, hi, d, W: int, n_rules: int, max_iters: int, interpret: bool, group: int):
    """[B, W<=group] int32 ids -> (ids with -1 holes compacted, counts)."""
    B = ids.shape[0]
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    ids = jnp.where(pos < counts[:, None], ids, -1)
    if W < group:
        ids = jnp.pad(ids, ((0, 0), (0, group - W)), constant_values=-1)
    per_tile = SUB * LANES // group
    n_t = -(-B // per_tile)
    padded = jnp.pad(ids, ((0, n_t * per_tile - B), (0, 0)), constant_values=-1)
    tiled = padded.reshape(n_t, SUB, LANES)
    out = _bpe_tiles(tiled, lo, hi, d, n_rules, max_iters, interpret, group)
    full = out.reshape(n_t * per_tile, group)[:B]
    # One stable compaction: ids fit 16 bits (MergeTable caps the vocab),
    # so (hole-last position key << 16 | id) packs into one positive
    # int32 and a SINGLE-operand sort replaces the argsort +
    # take_along_axis pair (a 16 M-element gather was the old floor).
    gpos = jnp.arange(group, dtype=jnp.int32)[None, :]
    sort_keys = jnp.where(full >= 0, gpos, group + gpos)
    packed = jax.lax.sort((sort_keys << 16) | (full & jnp.int32(0xFFFF)), dimension=1)
    new_counts = jnp.sum((full >= 0).astype(jnp.int32), axis=1)
    vals = packed & jnp.int32(0xFFFF)
    live = gpos < new_counts[:, None]
    return jnp.where(live, vals, -1)[:, :W], new_counts


def bpe_encode_fused(tokens, table, *, interpret: bool | None = None):
    """Fused-kernel encode for width<=32 pretokens (the short-word
    benchmark shapes); wider batches fall back to ``bpe.bpe_encode``."""
    from stringwars_tpu.ops.bpe import bpe_encode

    W = int(tokens.data.shape[1])
    rules = table.rule_maps()
    if W > 2 * GROUP or rules is None:
        return bpe_encode(tokens, table, interpret=interpret)
    group = GROUP if W <= GROUP else 2 * GROUP
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _encode_fused(
        tokens.data.astype(jnp.int32),
        tokens.lengths.astype(jnp.int32),
        jnp.asarray(rules.lo),
        jnp.asarray(rules.hi),
        jnp.asarray(rules.delta),
        W,
        rules.count,
        max_iters=W,
        interpret=bool(interpret),
        group=group,
    )
