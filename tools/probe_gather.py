"""On-chip probe: lane dynamic_gather as a LUT primitive (see ops/lut.py).

Findings (2026-08-20, v5e via axon):
- lane gather axis=1 on (8,128): compiles, correct.
- sublane gather axis=0 on (256,128): compile helper HTTP 500 (unusable).
- a failed server-side compile wedges the helper queue ~20 min — this
  script therefore fails FAST and STOPS at the first server-side error.

Run: ``python tools/probe_gather.py [quick]``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from stringwars_tpu.ops import lut  # noqa: E402
from stringwars_tpu.ops.rulemap import FoldRules, range_map  # noqa: E402
from stringwars_tpu.utils.harness import chained_per_iter, fold_salt  # noqa: E402

N_MB = 64


def timed_rate(name: str, fn, n_elems: int) -> None:
    def body(salt, extra, x, *cs):
        out = fn((x ^ salt.astype(jnp.int32)) & 0x7FFFFFFF, *cs)
        return fold_salt(salt, out.reshape(-1)[:1024]), extra

    x = jnp.arange(n_elems, dtype=jnp.int32)
    try:
        r = chained_per_iter(body, (x,), log=lambda m: print(f"  {name}: {m}", flush=True))
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        raise SystemExit(1)  # stop before wedging the helper further
    per = r["per_iter_s"]
    print(
        f"{name}: {n_elems * 4 / per / 1e9:.1f} GB/s(i32) = "
        f"{n_elems / per / 1e9:.2f} G lookups/s ({per * 1e3:.3f} ms, k={r['k']})",
        flush=True,
    )


def main() -> None:
    print(jax.devices(), flush=True)
    quick = "quick" in sys.argv[1:]
    n = (8 if quick else N_MB) << 18  # i32 elements

    # correctness at small scale first (any server-side failure stops us)
    rng = np.random.default_rng(0)
    t1280 = (np.arange(1280, dtype=np.int32) * 5 + 11).astype(np.int32)
    small = jnp.asarray(rng.integers(0, 1280, 4096).astype(np.int32))
    got = np.asarray(lut.lut_map(small, t1280))
    ref = t1280[np.asarray(small)]
    print("lut_map(1280) correct:", np.array_equal(got, ref), flush=True)

    pm, pg = lut.paged_lut_tables(t1280)
    print(f"paged: page_map {pm.shape[0]}, pages {pg.shape[0]}", flush=True)

    # timing: 1280-entry LUT via 10 windows vs a 90-rule walk
    timed_rate("lut1280", lambda x: lut.lut_map(x % 1280, t1280), n)

    t256 = (np.arange(256, dtype=np.int32) * 3 + 7).astype(np.int32)
    timed_rate("lut256", lambda x: lut.lut_map(x & 255, t256), n)

    lo = np.sort(rng.integers(0, 1280, 90)).astype(np.int32)
    rules = FoldRules(
        lo=lo,
        hi=(lo + rng.integers(1, 40, 90)).astype(np.int32),
        delta=rng.integers(-100, 100, 90).astype(np.int32),
        pmask=np.zeros(90, np.int32),
        par=np.zeros(90, np.int32),
    )
    timed_rate("walk90", lambda x: range_map(x % 1280, rules), n)


if __name__ == "__main__":
    main()
