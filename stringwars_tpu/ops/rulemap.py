"""Unicode table lookups: step-function / range-rule maps (K9/K10).

XLA-level table gathers run near-scalar (~0.1 G lookups/s —
PERFORMANCE.md finding #4), so per-codepoint class/fold lookups that
used ``jnp.take(table, cps)`` are evaluated by one of two kernels,
chosen by a cost model:

- the **lane-gather LUT** (``ops/lut.py``): the dense table rides into
  the kernel and each 128-entry window is one ``tpu.dynamic_gather``
  (31-68 G lookups/s measured) — wins whenever the table is small
  enough that ``windows + 3 < rules``;
- the **rule walk** below: arithmetic over the table's RUN STRUCTURE —
  wins for maps whose domain is huge but whose run count is small
  (pruned sentence-break tables reaching 0x10FFFF, sparse BPE pair
  keys).

The walk formulation:

- A dense class table (grapheme/word/sentence break classes, whitespace,
  pictographic, ...) is a step function: ``value(cp) = Σ_r dv_r · [cp >=
  start_r]`` over its run boundaries (21 runs for whitespace, ~1.7k for
  grapheme classes). Three VPU ops per boundary, zero gathers.
- The case-fold map is identity plus ~200 range rules (contiguous blocks
  with a constant delta, alternating-parity blocks, singletons):
  ``fold(cp) = cp + Σ_r d_r · [lo_r <= cp <= hi_r and parity matches]``.

Both evaluate in one Pallas kernel: the codepoint block stays resident in
VMEM while a ``fori_loop`` walks the rule arrays in SMEM — the input is
read once from HBM regardless of rule count. A staging-time ``prune``
keeps only the boundaries a corpus' observed codepoint range can hit
(compile-per-corpus specialization), which collapses e.g. sentence-break
from ~3.4k boundaries to ~100 for Latin/Greek/Cyrillic text.

The XLA gather forms remain the CPU path and the conformance oracle.
Reference workloads: ``tokenization/bench.rs:78-456`` (TR29/UAX#14
segmentation), ``normalization/bench.rs:58-141`` (fold/normalize).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM-resident codepoint tile per grid step. 256 KB blocks: the original
# (8, 1024) = 32 KB blocks measured DMA-overhead-bound (the German-fold
# rule stage profiled 15.4 ms where op counts predicted ~3 — thousands of
# tiny grid steps; the single-pass bytesum kernel hit the same wall).
_BLOCK = (64, 1024)
_MAX_CP = 0x110000


@dataclasses.dataclass(frozen=True)
class StepRules:
    """A dense int table compiled to its step-function boundaries."""

    starts: np.ndarray  # int32 [R] ascending; starts[0] == 0
    deltas: np.ndarray  # int32 [R]; value(cp) = Σ deltas[starts <= cp]

    @property
    def count(self) -> int:
        return int(self.starts.shape[0])

    def prune(self, max_cp: int) -> "StepRules":
        """Keep only boundaries reachable by cp <= max_cp (staging-time
        specialization; caller guarantees the bound)."""
        keep = self.starts <= max_cp
        return StepRules(self.starts[keep], self.deltas[keep])


def compile_steps(table: np.ndarray) -> StepRules:
    """Compile a dense cp->value table into step boundaries."""
    t = np.asarray(table, np.int64)
    change = np.flatnonzero(t[1:] != t[:-1]) + 1
    starts = np.concatenate([[0], change]).astype(np.int32)
    values = t[starts]
    deltas = np.diff(values, prepend=0).astype(np.int32)
    return StepRules(starts=starts, deltas=deltas)


@dataclasses.dataclass(frozen=True)
class FoldRules:
    """Range rules for a sparse delta map (case folding and friends).

    Rule r adds ``delta_r`` where ``lo_r <= cp <= hi_r`` and
    ``cp & pmask_r == par_r`` (pmask 0 = any parity, 1 = alternating
    blocks that map every second codepoint)."""

    lo: np.ndarray
    hi: np.ndarray
    delta: np.ndarray
    pmask: np.ndarray
    par: np.ndarray
    base: int = 0  # 0: out = cp + acc (delta map); 1: out = acc (value map)

    @property
    def count(self) -> int:
        return int(self.lo.shape[0])

    def prune(self, max_cp: int) -> "FoldRules":
        keep = self.lo <= max_cp
        return FoldRules(
            self.lo[keep], self.hi[keep], self.delta[keep],
            self.pmask[keep], self.par[keep], self.base,
        )


def compile_fold(table: np.ndarray) -> FoldRules:
    """Compile a mostly-identity cp->cp map into range delta rules.

    Detects stride-1 and stride-2 (alternating) constant-delta runs;
    entries with ``table[cp] < 0`` (escape markers) are treated as
    identity here — callers handle them through a separate value map.
    """
    t = np.asarray(table, np.int64)
    cps = np.arange(t.shape[0], dtype=np.int64)
    active = (t >= 0) & (t != cps)
    idx = np.flatnonzero(active)
    delta = (t[idx] - idx).astype(np.int64)
    lo, hi, dv, pm, pr = [], [], [], [], []
    i = 0
    while i < idx.size:
        j = i
        while j + 1 < idx.size and idx[j + 1] == idx[j] + 1 and delta[j + 1] == delta[i]:
            j += 1
        k = i
        while k + 1 < idx.size and idx[k + 1] == idx[k] + 2 and delta[k + 1] == delta[i]:
            k += 1
        if (k - i) > (j - i):
            lo.append(idx[i]); hi.append(idx[k]); dv.append(delta[i])
            pm.append(1); pr.append(int(idx[i]) & 1)
            i = k + 1
        else:
            lo.append(idx[i]); hi.append(idx[j]); dv.append(delta[i])
            pm.append(0); pr.append(0)
            i = j + 1
    mk = lambda v: np.asarray(v, np.int32)  # noqa: E731
    return FoldRules(mk(lo), mk(hi), mk(dv), mk(pm), mk(pr))


def compile_sparse_values(keys: np.ndarray, values: np.ndarray) -> FoldRules:
    """Singleton value map (cp -> value, 0 elsewhere) as equality rules,
    merging consecutive-key constant-value runs."""
    keys = np.asarray(keys, np.int64)
    values = np.asarray(values, np.int64)
    order = np.argsort(keys)
    keys, values = keys[order], values[order]
    lo, hi, dv = [], [], []
    i = 0
    while i < keys.size:
        j = i
        while j + 1 < keys.size and keys[j + 1] == keys[j] + 1 and values[j + 1] == values[i]:
            j += 1
        lo.append(keys[i]); hi.append(keys[j]); dv.append(values[i])
        i = j + 1
    mk = lambda v: np.asarray(v, np.int32)  # noqa: E731
    z = np.zeros(len(lo), np.int32)
    return FoldRules(mk(lo), mk(hi), mk(dv), z, z.copy(), base=1)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _step_kernel(n_rules: int):
    def kernel(starts_ref, deltas_ref, cps_ref, out_ref):
        cps = cps_ref[...]

        def body(r, acc):
            s = starts_ref[r]
            dv = deltas_ref[r]
            return acc + jnp.where(cps >= s, dv, 0)

        out_ref[...] = jax.lax.fori_loop(0, n_rules, body, jnp.zeros_like(cps))

    return kernel


def _range_kernel(n_rules: int, add_base: bool):
    def kernel(lo_ref, hi_ref, d_ref, pm_ref, pr_ref, cps_ref, out_ref):
        cps = cps_ref[...]

        def body(r, acc):
            lo = lo_ref[r]
            hi = hi_ref[r]
            ok = (cps >= lo) & (cps <= hi) & ((cps & pm_ref[r]) == pr_ref[r])
            return acc + jnp.where(ok, d_ref[r], 0)

        acc = jax.lax.fori_loop(0, n_rules, body, jnp.zeros_like(cps))
        out_ref[...] = (cps + acc) if add_base else acc

    return kernel


def _tile(cps_flat: jax.Array) -> tuple[jax.Array, tuple[int, ...]]:
    n = cps_flat.shape[0]
    per = _BLOCK[0] * _BLOCK[1]
    rows = max(1, -(-n // per))
    padded = jnp.pad(cps_flat, (0, rows * per - n))
    return padded.reshape(rows * _BLOCK[0], _BLOCK[1]), n


@functools.partial(jax.jit, static_argnames=("n_rules", "interpret"))
def _step_call(starts, deltas, cps2d, n_rules: int, interpret: bool):
    grid = (cps2d.shape[0] // _BLOCK[0],)
    return pl.pallas_call(
        _step_kernel(n_rules),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(_BLOCK, lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec(_BLOCK, lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(cps2d.shape, jnp.int32),
        interpret=interpret,
    )(starts, deltas, cps2d)


@functools.partial(jax.jit, static_argnames=("n_rules", "add_base", "interpret"))
def _range_call(lo, hi, d, pm, pr, cps2d, n_rules: int, add_base: bool, interpret: bool):
    grid = (cps2d.shape[0] // _BLOCK[0],)
    return pl.pallas_call(
        _range_kernel(n_rules, add_base),
        grid=grid,
        in_specs=[
            *[pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(5)],
            pl.BlockSpec(_BLOCK, lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec(_BLOCK, lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(cps2d.shape, jnp.int32),
        interpret=interpret,
    )(lo, hi, d, pm, pr, cps2d)


def _use_pallas(interpret: bool | None) -> tuple[bool, bool]:
    """(use_pallas_kernel, interpret_flag)."""
    if interpret is None:
        return jax.default_backend() == "tpu", False
    return True, interpret


# --- lane-gather LUT route (ops/lut.py) ------------------------------------
#
# Cost model per 1024-element slab (measured, see ops/lut.py): the LUT
# costs ~(windows + 3) op-units, the walk ~rules op-units.


def _lut_wins(table_size: int, rules: int) -> bool:
    n_win = -(-table_size // 128)
    return (n_win + 3) < rules


def _dense_delta_table(rules: FoldRules) -> np.ndarray:
    """Dense int32 delta/value table over [0, hi.max()+2) — the final
    entry is rule-free so clamped out-of-range lookups read 0."""
    size = int(rules.hi.max()) + 2
    t = np.zeros(size, np.int64)
    for r in range(rules.count):
        lo, hi = int(rules.lo[r]), int(rules.hi[r])
        seg = np.arange(lo, hi + 1, dtype=np.int64)
        pm = int(rules.pmask[r])
        if pm:
            seg = seg[(seg & pm) == int(rules.par[r])]
        t[seg] += int(rules.delta[r])
    return t.astype(np.int32)


def step_map(cps: jax.Array, rules: StepRules, table: np.ndarray | None = None, *, interpret: bool | None = None) -> jax.Array:
    """Evaluate a compiled step table over any-shape int codepoints.

    On TPU: the Pallas boundary-walk kernel. Elsewhere: the plain gather
    over ``table`` (pass it to avoid reconstruction) — fast on CPU and the
    conformance oracle for the kernel.
    """
    shape = cps.shape
    cps = cps.astype(jnp.int32)
    pallas, interp = _use_pallas(interpret)
    if not pallas:
        if table is None:
            table = expand_steps(rules)
        return jnp.take(jnp.asarray(table, jnp.int32), cps)
    size = int(rules.starts[-1]) + 1 if rules.count else 1
    if _lut_wins(size, rules.count):
        # Step functions are constant past the last boundary, so clamped
        # indices are exact for every cp.
        from stringwars_tpu.ops.lut import lut_map

        dense = expand_steps(rules, size) if table is None else np.asarray(table)[:size]
        return lut_map(
            jnp.clip(cps, 0, size - 1), dense,
            interpret=interp if interpret is not None else None,
        )
    flat, n = _tile(cps.reshape(-1))
    out = _step_call(
        jnp.asarray(rules.starts), jnp.asarray(rules.deltas), flat, rules.count, interp
    )
    return out.reshape(-1)[:n].reshape(shape)


def range_map(cps: jax.Array, rules: FoldRules, *, interpret: bool | None = None) -> jax.Array:
    """Evaluate compiled range rules (delta map when ``rules.base == 0``,
    sparse value map when 1) over any-shape codepoints."""
    shape = cps.shape
    cps = cps.astype(jnp.int32)
    if rules.count == 0:
        # Fully-pruned rule sets (corpus below every rule) — Mosaic
        # rejects zero-length SMEM operands, and there is nothing to do.
        return cps if rules.base == 0 else jnp.zeros_like(cps)
    pallas, interp = _use_pallas(interpret)
    if not pallas:
        out = jnp.zeros_like(cps)
        for r in range(rules.count):
            ok = (
                (cps >= int(rules.lo[r]))
                & (cps <= int(rules.hi[r]))
                & ((cps & int(rules.pmask[r])) == int(rules.par[r]))
            )
            out = out + jnp.where(ok, int(rules.delta[r]), 0)
        return (cps + out) if rules.base == 0 else out
    size = int(rules.hi.max()) + 2
    if _lut_wins(size, rules.count):
        from stringwars_tpu.ops.lut import lut_map

        acc = lut_map(
            jnp.clip(cps, 0, size - 1),
            _dense_delta_table(rules),
            interpret=interp if interpret is not None else None,
        )
        return (cps + acc) if rules.base == 0 else acc
    flat, n = _tile(cps.reshape(-1))
    out = _range_call(
        jnp.asarray(rules.lo), jnp.asarray(rules.hi), jnp.asarray(rules.delta),
        jnp.asarray(rules.pmask), jnp.asarray(rules.par),
        flat, rules.count, rules.base == 0, interp,
    )
    return out.reshape(-1)[:n].reshape(shape)


def expand_steps(rules: StepRules, size: int = _MAX_CP) -> np.ndarray:
    """Reconstruct the dense table (tests / CPU gather path)."""
    table = np.zeros(size, np.int64)
    table[rules.starts] = rules.deltas
    return np.cumsum(table).astype(np.int32)
