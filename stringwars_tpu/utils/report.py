"""Reporting (layer L3): one canonical, column-aligned line per variant.

Layout-compatible with the reference's reporters (``utils.rs:623-714``,
``utils.py:243-336``) so outputs diff cleanly against StringWars runs: a
42-character left-aligned variant-name column, then columns joined by
``" | "`` in fixed order — primary rate, bytes/s (when distinct), latency
percentiles. The reference's Rust-only cyc/B and IPC columns are replaced by
an optional percent-of-roofline column (TPUs expose achieved HBM bandwidth,
not perf counters); columns that cannot be computed are omitted, never
reformatted.

Primary units mirror ``ReportAs`` (``utils.rs:546-561``): bytes/s, CUPS,
hashes/s, bits/s, cmp/s.
"""

from __future__ import annotations

import dataclasses

REPORT_NAME_WIDTH = 42

REPORT_UNITS = ("bytes", "cups", "hashes", "bits", "comparisons", "keys")


def scale_si(value: float) -> tuple[float, str]:
    """Scale to a metric prefix (G/M/k): returns (scaled, prefix)."""
    if value >= 1e9:
        return value / 1e9, "G"
    if value >= 1e6:
        return value / 1e6, "M"
    if value >= 1e3:
        return value / 1e3, "k"
    return value, ""


def format_byte_rate(bytes_per_second: float) -> str:
    value, prefix = scale_si(bytes_per_second)
    return f"{value:.2f} {prefix}B/s"


def format_si_rate(rate: float, unit: str, space_before_unit: bool) -> str:
    value, prefix = scale_si(rate)
    if not prefix:
        return f"{value:.2f} {unit}"
    return f"{value:.2f} {prefix} {unit}" if space_before_unit else f"{value:.2f} {prefix}{unit}"


def format_seconds(seconds: float) -> str:
    if seconds < 1e-6:
        return f"{seconds * 1e9:.2f} ns"
    if seconds < 1e-3:
        return f"{seconds * 1e6:.2f} µs"
    if seconds < 1.0:
        return f"{seconds * 1e3:.2f} ms"
    return f"{seconds:.2f} s"


@dataclasses.dataclass(frozen=True)
class BenchStats:
    """Raw measurements for one variant, as produced by ``measure_throughput``."""

    elapsed_seconds: float
    elements: int
    bytes: int
    latencies_seconds: list[float] | None = None

    @property
    def bytes_per_second(self) -> float:
        return self.bytes / max(self.elapsed_seconds, 1e-12)

    @property
    def elements_per_second(self) -> float:
        return self.elements / max(self.elapsed_seconds, 1e-12)

    def latency_quantile(self, fraction: float) -> float | None:
        if not self.latencies_seconds:
            return None
        ordered = sorted(self.latencies_seconds)
        rank = round(fraction * (len(ordered) - 1))
        return ordered[min(rank, len(ordered) - 1)]

    def report(self, name: str, unit: str = "bytes", *, roofline_bytes_per_second: float | None = None) -> str:
        """Print and return the canonical result line for this variant."""
        line = format_report_line(
            name,
            unit,
            self.elapsed_seconds,
            self.elements,
            self.bytes,
            self.latencies_seconds,
            roofline_bytes_per_second=roofline_bytes_per_second,
        )
        print(line, flush=True)
        return line


def format_report_line(
    name: str,
    unit: str,
    elapsed_seconds: float,
    elements: int,
    total_bytes: int,
    latencies_seconds: list[float] | None = None,
    *,
    roofline_bytes_per_second: float | None = None,
) -> str:
    seconds = max(elapsed_seconds, 1e-12)
    elements_per_second = elements / seconds
    bytes_per_second = total_bytes / seconds

    columns: list[str] = []
    if unit == "bytes":
        columns.append(format_byte_rate(bytes_per_second))
    elif unit == "cups":
        columns.append(format_si_rate(elements_per_second, "CUPS", False))
    elif unit == "hashes":
        columns.append(format_si_rate(elements_per_second, "hashes/s", True))
    elif unit == "bits":
        columns.append(format_si_rate(elements_per_second, "bits/s", True))
    elif unit == "comparisons":
        columns.append(format_si_rate(elements_per_second, "cmp/s", True))
    elif unit == "keys":
        columns.append(format_si_rate(elements_per_second, "keys/s", True))
    else:
        raise ValueError(f"Unknown report unit: {unit!r}")

    if unit != "bytes" and total_bytes > 0:
        columns.append(format_byte_rate(bytes_per_second))

    if roofline_bytes_per_second:
        columns.append(f"{100.0 * bytes_per_second / roofline_bytes_per_second:.1f}% SoL")

    if latencies_seconds:
        ordered = sorted(latencies_seconds)

        def quantile(fraction: float) -> float:
            rank = round(fraction * (len(ordered) - 1))
            return ordered[min(rank, len(ordered) - 1)]

        columns.append(f"p50 {format_seconds(quantile(0.5))} p99 {format_seconds(quantile(0.99))}")

    return f"{name:<{REPORT_NAME_WIDTH}} {' | '.join(columns)}"


def report_stats(
    name: str,
    unit: str,
    elapsed_seconds: float,
    elements: int,
    total_bytes: int,
    latencies_seconds: list[float] | None = None,
) -> None:
    """Functional reporter mirroring the reference's ``report_stats`` signature."""
    print(
        format_report_line(name, unit, elapsed_seconds, elements, total_bytes, latencies_seconds),
        flush=True,
    )


def report_skip(name: str, reason: str) -> None:
    """The skip-not-crash line (reference ``similarities/bench.rs:632-636``)."""
    print(f"{name:<{REPORT_NAME_WIDTH}} SKIPPED ({reason})", flush=True)
