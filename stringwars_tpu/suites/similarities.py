"""Similarities suite: uniform / linear / affine gap-cost groups over dense
query x candidate cross-products (reference ``similarities/bench.rs:269-1026``,
defaults 5 s + 30 s, words tokens on DNA-style corpora).

Workload shape mirrors the reference: ``side = round(sqrt(batch))`` queries
vs candidates from disjoint token slices, every (q, c) pair scored per call,
CUPS = sum(|q|) * sum(|c|) cells per pass (``similarities/bench.rs:113-118,
216-224``).
"""

from __future__ import annotations

import math

import numpy as np

from stringwars_tpu.ops import similarity as S
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits, sync


def build_crossproduct(ctx: SuiteContext, max_side: int = 64, max_len: int = 256):
    tokens = [t for t in ctx.tape.to_list() if t][: 2 * max_side * max_side]
    tokens = [t[:max_len] for t in tokens]
    side = int(math.sqrt(max(len(tokens) // 2, 1)))
    side = min(side, max_side)
    if side < 1:
        raise ValueError("not enough tokens for a cross-product")
    queries = tokens[:side]
    candidates = tokens[side : 2 * side]
    pairs_a, pairs_b = [], []
    for q in queries:
        for c in candidates:
            pairs_a.append(q)
            pairs_b.append(c)
    batch = S.pack_pairs(pairs_a, pairs_b)
    cells = sum(len(q) for q in queries) * sum(len(c) for c in candidates)
    total_bytes = sum(map(len, pairs_a)) + sum(map(len, pairs_b))
    return batch, cells, total_bytes, queries, candidates


def main() -> None:
    ctx = setup_suite(
        "Edit distances / alignment scores (wavefront DP engines)",
        default_tokens="lines",
        default_warmup=5.0,
        default_time=30.0,
        default_synthetic="dna-100b",
    )
    try:
        batch, cells, total_bytes, queries, candidates = build_crossproduct(ctx)
    except ValueError as error:
        from stringwars_tpu.utils.report import report_skip

        report_skip("similarities/*", str(error))
        return
    import sys

    print(
        f"cross-product {len(queries)}x{len(candidates)} pairs, width {batch.width}, "
        f"{cells:,} cells/pass",
        file=sys.stderr,
    )

    ctx.group("uniform")
    ctx.run(
        "uniform/swtpu::levenshtein<1chip>",
        "cups",
        lambda: (sync(S.levenshtein(batch)), WorkUnits(cells, total_bytes))[1],
    )

    # Host baseline: stdlib-ish DP on the diagonal only (reference baselines
    # run one pair per call on the diagonal, similarities/bench.rs:746-753).
    diag = [(q, c) for q, c in zip(queries, candidates)]
    diag_cells = sum(len(q) * len(c) for q, c in diag)
    diag_bytes = sum(len(q) + len(c) for q, c in diag)

    def host_routine() -> WorkUnits:
        for q, c in diag:
            S.levenshtein_ref(q, c)
        return WorkUnits(diag_cells, diag_bytes)

    ctx.run("uniform/python-dp-diagonal", "cups", host_routine)

    ctx.group("linear")
    ctx.run(
        "linear/swtpu::needleman_wunsch<1chip>",
        "cups",
        lambda: (sync(S.nw_score_linear(batch)), WorkUnits(cells, total_bytes))[1],
    )
    ctx.run(
        "linear/swtpu::smith_waterman<1chip>",
        "cups",
        lambda: (sync(S.sw_score_linear(batch)), WorkUnits(cells, total_bytes))[1],
    )

    ctx.group("affine")
    ctx.run(
        "affine/swtpu::needleman_wunsch<1chip>",
        "cups",
        lambda: (sync(S.nw_score_affine(batch)), WorkUnits(cells, total_bytes))[1],
    )
    ctx.run(
        "affine/swtpu::smith_waterman<1chip>",
        "cups",
        lambda: (sync(S.sw_score_affine(batch)), WorkUnits(cells, total_bytes))[1],
    )


if __name__ == "__main__":
    main()
