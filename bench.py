#!/usr/bin/env python
"""Headline benchmark for the driver: prints ONE JSON line.

Measures the flagship kernels on the real TPU chip — each in its own
subprocess (the tunneled device client degrades in-process after heavy
Pallas compiles; see tools/tpu_campaign.py) — and prints the headline
JSON for the FIRST kernel that succeeds, so one hung kernel can never
starve the whole run (the round-1 failure mode). Kernel order puts the
flagship substring-find first; per-kernel budgets are sized so even the
worst case finishes inside the driver's budget.

The find headline uses the needle-cycling batch kernel (64 needles per
dispatch over a 128 MB haystack = 8 GB scanned per call), which matches
the reference's cycling hot loop (find/bench.rs:79-143) and amortizes the
tunnel's per-dispatch overhead.

Diagnostics to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

KERNELS = [
    # (campaign bench name, result key, reference baseline GB/s, budget s).
    # The headline is the first that succeeds. Baselines: sz::find 11.52,
    # sz::find_byteset 8.34, sz::bytesum 12.62, sz::hash 12.22 (BASELINE.md).
    # find-cycle64 leads: 64 needles x 128 MB = 8.6 GB scanned per dispatch,
    # so even a poisoned ~40 ms dispatch floor barely dents its GB/s, and
    # its compile is the likeliest cache-warm (committed .jax_cache entry).
    # Worst-case chain (all cold, all measured) = 480+150+120+120 = 870 s,
    # inside the driver's budget.
    ("find-cycle64-8B-128MB", "find_8B", 11.52, 480.0),
    ("byteset-128MB", "byteset_find", 8.34, 150.0),
    ("bytesum-256MB", "bytesum", 12.62, 120.0),
    ("swh64-1KB-lines-128MB", "swh64_hash", 12.22, 120.0),
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_kernel(name: str, timeout_s: float) -> dict | None:
    campaign = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "tpu_campaign.py")
    try:
        proc = subprocess.run(
            [sys.executable, campaign, "--only", name, "--max-wait", "120"],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
    except subprocess.TimeoutExpired:
        log(f"{name}: timed out after {timeout_s:.0f}s")
        return None
    for line in proc.stderr.splitlines()[-4:]:
        log(f"  {line}")
    try:
        results = json.loads(proc.stdout)
        return results.get(name)
    except (json.JSONDecodeError, AttributeError):
        log(f"{name}: no parseable output")
        return None


def main() -> None:
    for name, key, baseline, budget in KERNELS:
        out = run_kernel(name, budget)
        if out and "value" in out:
            log(f"{key}: {out['value']} GB/s ({out['ms']} ms)")
            print(
                json.dumps(
                    {
                        "metric": f"{key}_throughput",
                        "value": round(out["value"], 2),
                        "unit": "GB/s",
                        "vs_baseline": round(out["value"] / baseline, 2),
                    }
                ),
                flush=True,
            )
            return
    print(json.dumps({"metric": "none", "value": 0, "unit": "GB/s", "vs_baseline": 0}), flush=True)


if __name__ == "__main__":
    main()
