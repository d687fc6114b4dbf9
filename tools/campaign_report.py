#!/usr/bin/env python
"""Render campaign JSON (tools/tpu_campaign.py stdout) as the
PERFORMANCE.md comparison table: swtpu value, reference best, ratio.

Usage: python tools/campaign_report.py /tmp/campaign_r3.json
"""

from __future__ import annotations

import json
import sys

# row-name prefix -> (label, reference best, reference unit/source)
REFS = {
    "find-cycle64-8B": ("substring find, 8 B needles x64 (K1, Pallas)", 11.52, "GB/s sz SPR"),
    "find-cycle64-16B": ("substring find, 16 B needles", 11.52, "GB/s sz SPR"),
    "byteset": ("byteset scan (K2)", 8.34, "GB/s sz"),
    "bytesum-xla": ("bytesum, fused-XLA tree reduce (diagnostic)", 12.62, "GB/s sz"),
    "bytesum": ("bytesum, single-pass Pallas (K4)", 12.62, "GB/s sz"),
    "swh64-1KB": ("swh64 64-bit hash, 1 KB lines (K3)", 12.22, "GB/s sz"),
    "xxh64-1KB": ("xxh64 spec-exact, 1 KB lines (K3)", 12.22, "GB/s sz"),
    "xxh3-1KB": ("xxh3-64 spec-exact, 1 KB lines (K3)", 10.0, "GB/s xxh3"),
    "swh64-multiseed16-words": ("swh64 multiseed x16, words (1024-bit digests)", 71.85, "Gbit/s sz"),
    "swh64-multiseed16-1KB": ("swh64 multiseed x16 over 1 KB lines (stream)", None, "per-seed stream GB/s"),
    "sha256": ("SHA-256, 1 KB lines (K4)", 1.9, "GB/s ring"),
    "lev-myers-64k": ("Levenshtein, Myers Pallas 64kx256 B (K5)", 141.8, "GCUPS 16-core"),
    "lev-myers-dna": ("Levenshtein, Myers DNA 3-plane (K5)", 141.8, "GCUPS 16-core"),
    "levenshtein-8192": ("Levenshtein, XLA wavefront (K5)", 15.7, "GCUPS 1-core"),
    "nw-affine-8192": ("NW affine, XLA wavefront scan (K5)", 2.66, "GCUPS 1-core"),
    "nw-affine-32k": ("NW affine, XLA wavefront 32k batch", 2.66, "GCUPS 1-core"),
    "nw-affine-pallas": ("NW affine, Gotoh Pallas 64kx256 B", 33.3, "GCUPS 16-core"),
    "sw-affine-pallas": ("SW affine, Gotoh Pallas 64kx256 B", 33.3, "GCUPS 16-core"),
    "nw-affine-i16": ("NW affine, packed-i16 Gotoh", 33.3, "GCUPS 16-core"),
    "sw-affine-i16": ("SW affine, packed-i16 Gotoh", 33.3, "GCUPS 16-core"),
    "nw-linear-pallas": ("NW linear, single-matrix Pallas", 90.5, "GCUPS 16-core"),
    "nw-linear-i16": ("NW linear, packed-i16", 90.5, "GCUPS 16-core"),
    "ac-mxu": ("Aho-Corasick MXU scan (K2)", 0.51, "GB/s aho-corasick"),
    "ac-pallas": ("Aho-Corasick Pallas LUT-gather scan (K2)", 0.51, "GB/s aho-corasick"),
    "ac-shiftand-": ("Shift-And 4-pattern scan (K2)", 0.51, "GB/s aho-corasick"),
    "ac-shiftand8": ("Shift-And 8-word dictionary (K2)", 0.51, "GB/s aho-corasick"),
    "argsort-2M": ("argsort, 2 M words (K11)", 0.23, "Gcmp/s CPU best"),
    "argsort-uncased": ("argsort-uncased, 2 M words (K11)", 0.097, "Gcmp/s sz uncased"),
    "lut-planes": ("LUT translate, select-planes (K12)", 10.22, "GB/s sz"),
    "lut-translate": ("LUT translate, gather (diagnostic)", 10.22, "GB/s sz"),
    "lut-take-fixed": ("LUT translate, static-table gather (diagnostic)", 10.22, "GB/s sz"),
    "fill-random": ("fill_random / Threefry (K12)", 20.4, "GB/s sz best"),
    "chacha20-xor": ("ChaCha20 keystream-xor (K13)", 0.80, "GB/s ring"),
    "fingerprint-512d": ("MinHash fingerprints 512-d (K6)", 0.707, "GB/s H100"),
    "utf8-count": ("utf8 codepoint count (K8)", 18.1, "GB/s find_nth_utf8"),
    "casefold-ascii": ("case fold, ASCII fast path (K10)", 7.53, "GB/s Zen5 EN"),
    "casefold-tokens": ("case fold, random-byte tokens (diagnostic)", None, "synthetic"),
    "casefold-general": ("case fold, general 1->N multilingual (K10)", 2.59, "GB/s sz Zen5 DE"),
    "casefold-german": ("case fold, German-range corpus (K10)", 2.59, "GB/s sz Zen5"),
    "casefold-russian": ("case fold, Russian corpus (K10)", 2.20, "GB/s sz Zen5"),
    "casefold-greek": ("case fold, Greek corpus (K10)", 1.00, "GB/s sz Zen5"),
    "uncased-find-8cp": ("case-insensitive find, cp-window Pallas (K10)", 12.79, "GB/s sz"),
    "uncased-find-ascii64": ("case-insensitive find, ASCII panel x64 (K10)", 12.79, "GB/s sz"),
    "nfc-multilingual": ("NFC normalize, multilingual (K10)", None, "no published ref"),
    "nfd-multilingual": ("NFD normalize, multilingual (K10)", None, "no published ref"),
    "nfkc-multilingual": ("NFKC normalize, multilingual (K10)", None, "no published ref"),
    "nfkd-multilingual": ("NFKD normalize, multilingual (K10)", None, "no published ref"),
    # Segmentation references are the BASELINE.md SPR rows
    # (tokenization/README.md:26-138).
    "tr29-words-multilingual": ("TR29 words, multilingual corpus (K9)", 0.35, "GB/s sz SPR EN"),
    "tr29-words-128MB": ("TR29 words at 128 MB (scale check)", 0.35, "GB/s sz SPR"),
    "tr29-words": ("TR29 word segmentation (K9)", 0.35, "GB/s sz SPR"),
    "tr29-graphemes": ("TR29 grapheme segmentation (K9)", 0.26, "GB/s sz SPR"),
    "tr29-sentences": ("TR29 sentence segmentation (K9)", 0.64, "GB/s sz SPR"),
    "uax14-lines-16MB": ("UAX#14 line breaks, 16 MB row (K9)", 0.36, "GB/s sz SPR"),
    "uax14-lines": ("UAX#14 line breaks (K9)", 0.36, "GB/s sz SPR"),
    "whitespace-split": ("whitespace split (K9)", 0.70, "GB/s sz SPR"),
    "newline-split": ("newline split (K9)", 3.06, "GB/s sz SPR (18.3 Zen5)"),
    "bpe-1M": ("BPE encode, 1 M short words", None, "no ref row"),
    "vpu-u32-ops-probe": ("u32 VPU lane-op probe", None, "roofline calib"),
}


def main() -> None:
    with open(sys.argv[1]) as fh:
        results = json.load(fh)
    for name, row in results.items():
        if "value" not in row:
            print(f"| {name} | FAILED: {row.get('error', '?')} | | |")
            continue
        label, ref, src = name, None, ""
        for prefix, (lbl, r, s) in REFS.items():
            if name.startswith(prefix):
                label, ref, src = lbl, r, s
                break
        v = row["value"]
        unit = row.get("unit", "GB/s")
        if ref:
            print(f"| {label} | **{v:g} {unit}** | {ref:g} {src} | {v / ref:.1f}x |")
        else:
            print(f"| {label} | **{v:g} {unit}** | — ({src}) | — |")


if __name__ == "__main__":
    main()
