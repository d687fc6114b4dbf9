#!/usr/bin/env python
"""Stage-by-stage on-chip timing of the TR29 word pipeline (chained).

Times CUMULATIVE prefixes of ``segment.word_boundaries`` on a 32 MB
English corpus so stage cost = difference of adjacent rows — the same
methodology as the round-4 German-fold profile. Run on the real chip:

    timeout 1800 python tools/profile_tr29.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/swtpu-xla")
)

from stringwars_tpu.ops import segment
from stringwars_tpu.ops.segment import _CONT, _W, _byte_space, _class_of
from stringwars_tpu.utils.harness import chained_per_iter, fold_salt


def _corpus(n: int) -> np.ndarray:
    rng = np.random.default_rng(5)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"don't", b"42.5"]
    parts = []
    size = 0
    while size < n:
        w = words[int(rng.integers(0, len(words)))]
        parts.append(w)
        parts.append(b" " if rng.integers(0, 8) else b"\n")
        size += len(w) + 1
    return np.frombuffer(b"".join(parts)[:n], np.uint8)


def main():
    n = 32 << 20
    data = jnp.asarray(_corpus(n))
    max_cp = 0x7F

    def stage_decode(s, e, d):
        cp, is_lead, count = _byte_space(d ^ (s & jnp.uint32(0x7F)).astype(jnp.uint8), n)
        return fold_salt(s, count, cp[:8]), e

    def stage_classes(s, e, d):
        cp, is_lead, count = _byte_space(d ^ (s & jnp.uint32(0x7F)).astype(jnp.uint8), n)
        cls = jnp.where(is_lead, _class_of(cp, "word_break_table", max_cp), _CONT)
        pict = _class_of(cp, "extended_pictographic_table", max_cp).astype(bool) & is_lead
        return fold_salt(s, count, cls[:8], pict[:8].astype(jnp.int32)), e

    def stage_feats(s, e, d):
        cp, is_lead, count = _byte_space(d ^ (s & jnp.uint32(0x7F)).astype(jnp.uint8), n)
        cls = jnp.where(is_lead, _class_of(cp, "word_break_table", max_cp), _CONT)
        W = _W
        ignore = (cls == W["Extend"]) | (cls == W["Format"]) | (cls == W["ZWJ"])
        newline = (cls == W["CR"]) | (cls == W["LF"]) | (cls == W["Newline"])
        keep = ~ignore & is_lead
        ri = (cls == W["Regional_Indicator"]) & ~ignore
        basemask = ~ri & ~ignore & is_lead
        feats = segment._word_feats_scan(cls, keep, is_lead, newline, ri, basemask, n)
        return fold_salt(s, count, feats["prev_eff"][:8], feats["next_eff"][:8]), e

    def stage_full(s, e, d):
        b, cnt = segment.word_boundaries(
            d ^ (s & jnp.uint32(0x7F)).astype(jnp.uint8), n, max_cp=max_cp
        )
        return fold_salt(s, cnt), e

    for name, body in [
        ("decode", stage_decode),
        ("decode+classes", stage_classes),
        ("decode+classes+scan", stage_feats),
        ("full", stage_full),
    ]:
        diag = chained_per_iter(body, (data,), (), target_extra_s=0.5)
        per = diag["per_iter_s"]
        print(
            f"{name}: {per * 1e3:.2f} ms/iter = {n / per / 1e9:.2f} GB/s "
            f"(k={diag['k']}, compile {diag['compile_s']:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
