#!/usr/bin/env python
"""Headline benchmark for the driver: prints ONE JSON line.

Measures the flagship kernels on the real TPU chip — each in its own
subprocess (the tunneled device client degrades in-process after heavy
program loading; a fresh process per kernel measures clean, see
tools/tpu_campaign.py) — and reports find-kernel GB/s per chip against the
reference's best published number (sz::find 11.52 GB/s on Sapphire Rapids,
BASELINE.md), falling back to byteset -> xxh3 -> bytesum.
Diagnostics to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

KERNELS = [
    # (campaign bench name, result key, reference baseline GB/s).
    # Ordered by measurement reliability; the headline is the first that
    # succeeds. byteset is the find suite's byteset-forward group (vs
    # sz::find_byteset 8.34 GB/s, BASELINE.md).
    ("byteset-128MB", "byteset_find", 8.34),
    ("bytesum-256MB", "bytesum", 12.62),
    ("find-8B-needle-128MB", "find_8B", 11.52),
    ("swh64-1KB-lines-128MB", "swh64_hash", 12.22),
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_kernel(name: str, timeout_s: float = 900.0) -> dict | None:
    campaign = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "tpu_campaign.py")
    try:
        proc = subprocess.run(
            [sys.executable, campaign, "--only", name],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
    except subprocess.TimeoutExpired:
        log(f"{name}: timed out")
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
    results: dict[str, float] = {}
    for name, key, baseline in KERNELS:
        out = run_kernel(name)
        if out and "value" in out:
            results[key] = (out["value"], baseline)
            log(f"{key}: {out['value']} GB/s ({out['ms']} ms)")

    for _, key, baseline in KERNELS:
        if key in results:
            value, baseline = results[key]
            print(
                json.dumps(
                    {
                        "metric": f"{key}_throughput",
                        "value": round(value, 2),
                        "unit": "GB/s",
                        "vs_baseline": round(value / baseline, 2),
                    }
                ),
                flush=True,
            )
            return
    print(json.dumps({"metric": "none", "value": 0, "unit": "GB/s", "vs_baseline": 0}), flush=True)


if __name__ == "__main__":
    main()
