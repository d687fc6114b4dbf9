"""Fused prefix-scan engine for segmentation streams (K9).

The TR29/UAX#14 boundary kernels need ~5-10 prefix quantities per stream
position — running counts (RI parity, linker counts), last-value
propagation over masked positions ("class of the previous non-ignorable
codepoint"), two-back context, and one-position delays. The first
formulation expressed each as an XLA ``associative_scan`` over the full
stream; at benchmark scale (32-128 MB) the resulting programs composed
~15 log-depth shift networks of full-stream intermediates, which both
OOM-killed the server-side compile helper (83-114 KB MLIR, every
2026-08-18 campaign run) and paid ~10 HBM round-trips per scan at
runtime.

This engine runs ALL of a kernel's scans in ONE Pallas pass:

- The stream is tiled ``[rows, 1024]`` int32; one sequential grid step
  owns an (8, 1024) VMEM tile (8192 elements in row-major stream order).
- Within a tile, each scan is a register-resident Hillis-Steele network:
  10 lane-roll steps + 3 sublane-roll steps (``pltpu.roll`` + iota
  masks), so the log-depth traffic never touches HBM.
- Across tiles, carries live in SMEM scratch; TPU grids execute
  sequentially, so each step folds the previous carry in and writes the
  tile's last element back (one masked-sum scalar extraction per array).
- Later ops may read earlier ops' OUTPUT tiles (``env``), so chained
  scans (cummax over a cumsum, last-value of a derived run length)
  stay in the same kernel.

Program size is independent of stream length: the whole fused kernel is
a few hundred vector ops regardless of corpus size. Anti-causal scans
("next value") run the same engine over flipped inputs.

Reference workloads: ``tokenization/bench.rs:78-456``. The XLA
`associative_scan` helpers in ``ops/segment.py`` remain the CPU path and
the conformance oracle for this kernel (tests compare both on fuzzed
streams in interpret mode).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (32, 1024) i32 = 128 KB grid blocks: the original (8, 1024) = 32 KB
# blocks were DMA-overhead-bound (the TR29 scan stage profiled 20.7 of a
# 35.7 ms word iteration at 4096 tiny sequential grid steps — the same
# wall rulemap hit, PERFORMANCE.md finding #11). 64-sublane tiles gained
# only ~8% more (words 1.37 -> 1.49 GB/s) and crashed the linebreak
# kernel's server-side compile (HTTP 500), so 32 is the envelope.
_LANES = 1024
_SUBS = 32
_TILE = _SUBS * _LANES

_I32_MIN = -(1 << 31)


@dataclasses.dataclass(frozen=True)
class Op:
    """One fused scan.

    ``kind``: "sum" | "max" | "last" | "last2" | "delay" | "id"
    ("id" = elementwise passthrough with no carry — computes a derived
    tile ONCE for later ops to reference instead of re-inlining it).
    ``build(env)`` returns the op's input tile(s) from ``env`` — a dict of
    input tiles, previously computed op outputs (by name), plus ``valid``
    (bool, position < n) and ``pos`` (int32 global position):
      sum/max/delay -> one int32 tile; last/last2 -> (values, flag) tiles.
    ``init``: the "no previous value" default (last/last2/delay) or the
    identity (max; sum always 0).
    ``outs``: output names — 1 for most kinds, ("last", "prev") for last2.
    """

    kind: str
    name: str
    build: Callable[[dict], object]
    init: int = 0

    @property
    def outs(self) -> tuple[str, ...]:
        if self.kind == "last2":
            return (self.name, self.name + "2")
        if self.kind == "id":
            return ()  # kernel-internal: env-only, never written to HBM
        return (self.name,)

    @property
    def n_carry(self) -> int:
        return {"sum": 1, "max": 1, "last": 2, "last2": 3, "delay": 1, "id": 0}[self.kind]


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (_SUBS, _LANES), 1)


def _sub_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (_SUBS, _LANES), 0)


def _last_elem(t):
    """Scalar value of the tile's last element (stream order)."""
    pick = (_sub_iota() == _SUBS - 1) & (_lane_iota() == _LANES - 1)
    return jnp.sum(jnp.where(pick, t, 0))


def _shift_combine(x_list, comb, idents):
    """Inclusive Hillis-Steele over stream order for a tuple of arrays.

    ``comb(prev_tuple, cur_tuple) -> tuple`` must be associative;
    ``idents`` fill rolled-in positions (the scan identity).
    """
    lane = _lane_iota()
    sub = _sub_iota()
    # Lane axis: 10 doubling steps.
    k = 1
    while k < _LANES:
        shifted = tuple(
            jnp.where(lane >= k, pltpu.roll(a, k, axis=1), ident)
            for a, ident in zip(x_list, idents)
        )
        x_list = comb(shifted, x_list)
        k *= 2
    # Sublane axis on row totals (the last lane of each row, broadcast).
    tots = tuple(jnp.broadcast_to(a[:, _LANES - 1 :], (_SUBS, _LANES)) for a in x_list)
    k = 1
    while k < _SUBS:
        shifted = tuple(
            jnp.where(sub >= k, pltpu.roll(a, k, axis=0), ident)
            for a, ident in zip(tots, idents)
        )
        tots = comb(shifted, tots)
        k *= 2
    # Exclusive row prefix: inclusive totals shifted down one sublane.
    ex = tuple(
        jnp.where(sub >= 1, pltpu.roll(a, 1, axis=0), ident)
        for a, ident in zip(tots, idents)
    )
    return comb(ex, x_list)


def _scan_sum(v, carry_in):
    (out,) = _shift_combine((v,), lambda a, b: (a[0] + b[0],), (0,))
    return out + carry_in


def _scan_max(v, carry_in, ident):
    (out,) = _shift_combine(
        (v,), lambda a, b: (jnp.maximum(a[0], b[0]),), (ident,)
    )
    return jnp.maximum(out, carry_in)


def _last_comb(a, b):
    av, af = a
    bv, bf = b
    return jnp.where(bf > 0, bv, av), af | bf


def _scan_last(v, f, carry_v, carry_f, init):
    ov, of = _shift_combine((v, f), _last_comb, (init, 0))
    out = jnp.where(of > 0, ov, jnp.where(carry_f > 0, carry_v, init))
    new_v = jnp.where(of > 0, ov, carry_v)
    new_f = of | carry_f
    return out, new_v, new_f


def _last2_comb(a, b):
    al, ap, ac = a
    bl, bp, bc = b
    last = jnp.where(bc >= 1, bl, al)
    prev = jnp.where(bc >= 2, bp, jnp.where(bc == 1, al, ap))
    return last, prev, jnp.minimum(ac + bc, 2)


def _scan_last2(v, f, carry_l, carry_p, carry_c, init):
    cnt0 = jnp.where(f > 0, 1, 0)
    ol, op_, oc = _shift_combine(
        (v, jnp.zeros_like(v), cnt0), _last2_comb, (init, init, 0)
    )
    # Fold the carried (l, p, c) prefix in front of the tile's own scan.
    l2 = jnp.where(oc >= 1, ol, carry_l)
    p2 = jnp.where(oc >= 2, op_, jnp.where(oc == 1, carry_l, carry_p))
    c2 = jnp.minimum(carry_c + oc, 2)
    last = jnp.where(c2 >= 1, l2, init)
    prev = jnp.where(c2 >= 2, p2, init)
    return last, prev, l2, p2, c2


def _scan_delay(v, carry_in):
    lane = _lane_iota()
    r1 = pltpu.roll(v, 1, axis=1)
    # Lane 0 must take the previous ROW's last lane.
    d = jnp.where(lane == 0, pltpu.roll(r1, 1, axis=0), r1)
    first = (lane == 0) & (_sub_iota() == 0)
    return jnp.where(first, carry_in, d)


def _make_kernel(ops: tuple[Op, ...], in_names: tuple[str, ...], n: int):
    n_in = len(in_names)
    n_out = sum(len(op.outs) for op in ops)
    slots = []
    s = 0
    for op in ops:
        slots.append(s)
        s += op.n_carry
    n_carry = s

    def kernel(*refs):
        in_refs = refs[:n_in]
        out_refs = refs[n_in : n_in + n_out]
        carry = refs[n_in + n_out]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            for op, base in zip(ops, slots):
                if op.kind == "id":
                    continue
                if op.kind == "sum":
                    carry[base] = 0
                elif op.kind == "max":
                    carry[base] = jnp.int32(op.init)
                elif op.kind == "last":
                    carry[base] = jnp.int32(op.init)
                    carry[base + 1] = 0
                elif op.kind == "last2":
                    carry[base] = jnp.int32(op.init)
                    carry[base + 1] = jnp.int32(op.init)
                    carry[base + 2] = 0
                else:  # delay
                    carry[base] = jnp.int32(op.init)

        env = {}
        for i, name in enumerate(in_names):
            env[name] = in_refs[i][...]
        pos = (
            step * _TILE
            + _sub_iota() * _LANES
            + _lane_iota()
        )
        env["pos"] = pos
        env["valid"] = pos < n

        oi = 0
        for op, base in zip(ops, slots):
            if op.kind == "id":
                env[op.name] = op.build(env).astype(jnp.int32)
                continue
            if op.kind == "sum":
                v = op.build(env).astype(jnp.int32)
                out = _scan_sum(v, carry[base])
                carry[base] = _last_elem(out)
                env[op.name] = out
                out_refs[oi][...] = out
                oi += 1
            elif op.kind == "max":
                v = op.build(env).astype(jnp.int32)
                out = _scan_max(v, carry[base], jnp.int32(op.init))
                carry[base] = _last_elem(out)
                env[op.name] = out
                out_refs[oi][...] = out
                oi += 1
            elif op.kind == "last":
                v, f = op.build(env)
                v = v.astype(jnp.int32)
                f = jnp.where(f, 1, 0) if f.dtype == jnp.bool_ else f.astype(jnp.int32)
                out, nv, nf = _scan_last(
                    v, f, carry[base], carry[base + 1], jnp.int32(op.init)
                )
                carry[base] = _last_elem(nv)
                carry[base + 1] = _last_elem(nf)
                env[op.name] = out
                out_refs[oi][...] = out
                oi += 1
            elif op.kind == "last2":
                v, f = op.build(env)
                v = v.astype(jnp.int32)
                f = jnp.where(f, 1, 0) if f.dtype == jnp.bool_ else f.astype(jnp.int32)
                last, prev, nl, np_, nc = _scan_last2(
                    v, f, carry[base], carry[base + 1], carry[base + 2],
                    jnp.int32(op.init),
                )
                carry[base] = _last_elem(nl)
                carry[base + 1] = _last_elem(np_)
                carry[base + 2] = _last_elem(nc)
                env[op.name] = last
                env[op.name + "2"] = prev
                out_refs[oi][...] = last
                out_refs[oi + 1][...] = prev
                oi += 2
            else:  # delay
                v = op.build(env).astype(jnp.int32)
                out = _scan_delay(v, carry[base])
                carry[base] = _last_elem(v)
                env[op.name] = out
                out_refs[oi][...] = out
                oi += 1

    return kernel, n_out, n_carry


@functools.lru_cache(maxsize=None)
def _build_call(ops: tuple[Op, ...], in_names: tuple[str, ...], rows: int, n: int, interpret: bool):
    kernel, n_out, n_carry = _make_kernel(ops, in_names, n)
    grid = (rows // _SUBS,)
    spec = pl.BlockSpec((_SUBS, _LANES), lambda i: (i, 0))

    @jax.jit
    def call(*inputs):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * len(in_names),
            out_specs=[spec] * n_out,
            out_shape=[
                jax.ShapeDtypeStruct((rows, _LANES), jnp.int32) for _ in range(n_out)
            ],
            scratch_shapes=[pltpu.SMEM((max(n_carry, 1),), jnp.int32)],
            interpret=interpret,
        )(*inputs)

    return call


def fused_scan(
    inputs: dict[str, jax.Array],
    ops: tuple[Op, ...],
    n: int,
    *,
    reverse: bool = False,
    interpret: bool | None = None,
) -> dict[str, jax.Array]:
    """Run all ``ops`` over int32 streams in one Pallas pass.

    ``inputs``: name -> int32[n] arrays. Returns name -> int32[n] per op
    output. ``reverse=True`` computes suffix scans ("next value"): inputs
    are flipped, scanned forward, and outputs flipped back.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    names = tuple(sorted(inputs))
    arrs = [inputs[k].astype(jnp.int32) for k in names]
    if reverse:
        arrs = [jnp.flip(a) for a in arrs]
    rows = max(_SUBS, -(-n // _TILE) * _SUBS)
    pad = rows * _LANES - n
    tiled = [jnp.pad(a, (0, pad)).reshape(rows, _LANES) for a in arrs]
    call = _build_call(ops, names, rows, n, bool(interpret))
    outs = call(*tiled)
    flat_names = [o for op in ops for o in op.outs]
    result = {}
    for name, o in zip(flat_names, outs):
        flat = o.reshape(-1)[:n]
        result[name] = jnp.flip(flat) if reverse else flat
    return result


# ---------------------------------------------------------------------------
# Elementwise rule evaluator: the boundary kernels' pair-rule logic is
# 30-80 elementwise terms over ~10 feature arrays; left to XLA at stream
# scale it materializes as dozens of full-array HBM passes (the UAX#14
# rules stage profiled ~90 ms of a 126 ms iteration). This kernel loads
# every feature tile once and evaluates the whole rule function in
# registers — the same fn runs directly on full arrays for the CPU path.
# ---------------------------------------------------------------------------

_EW_BLK = 4  # (4, 32, 1024) int32 blocks: 512 KB per operand per step


def _ew_kernel(n_in: int, fn, names):
    def kernel(*refs):
        in_refs = refs[:n_in]
        out_ref = refs[n_in]
        for k in range(_EW_BLK):
            env = {name: in_refs[i][k] for i, name in enumerate(names)}
            out_ref[k] = fn(env).astype(jnp.int32)

    return kernel


@functools.lru_cache(maxsize=None)
def _ew_call(fn, names: tuple[str, ...], rows: int, interpret: bool):
    spec = pl.BlockSpec((_EW_BLK, _SUBS, _LANES), lambda i: (i, 0, 0))

    @jax.jit
    def call(*inputs):
        return pl.pallas_call(
            _ew_kernel(len(names), fn, names),
            grid=(rows // _EW_BLK,),
            in_specs=[spec] * len(names),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, _SUBS, _LANES), jnp.int32),
            interpret=interpret,
        )(*inputs)

    return call


def elementwise_map(
    inputs: dict[str, jax.Array], fn, n: int, *, interpret: bool | None = None
) -> jax.Array:
    """Evaluate ``fn(env) -> bool/int32`` over named int32 streams in one
    Pallas pass; returns int32[n]. ``fn`` must be elementwise and
    shape-agnostic (it also runs directly on the full arrays in the CPU
    path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    names = tuple(sorted(inputs))
    blk = _EW_BLK * _TILE
    rows = max(_EW_BLK * _SUBS, -(-n // blk) * _EW_BLK * _SUBS)
    pad = rows * _LANES - n
    tiled = [
        jnp.pad(inputs[k].astype(jnp.int32), (0, pad)).reshape(rows // _SUBS, _SUBS, _LANES)
        for k in names
    ]
    call = _ew_call(fn, names, rows // _SUBS, bool(interpret))
    out = call(*tiled)
    return out.reshape(-1)[:n]
