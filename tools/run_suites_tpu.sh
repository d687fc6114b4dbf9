#!/usr/bin/env bash
# Run every benchmark suite end-to-end on the real chip with a small
# budget and record the canonical report lines -> SUITES_TPU.md.
# Mirrors the reference's per-suite README transcripts.
set -u
out="${1:-SUITES_TPU.md}"
{
  echo "# Suite transcripts — TPU v5e single chip ($(date -u +%F))"
  echo
  echo "One run per suite: \`SWTPU_WARMUP=1 SWTPU_TIME=3\`, 32 MB synthetic"
  echo "corpora (seeded). Device rows measure under the chained-loop"
  echo "protocol (see PERFORMANCE.md); host baselines under the wall loop."
} > "$out"
for s in find hash memory sequence similarities fingerprints tokenization normalization containers encryption scaling; do
  echo "== $s =="
  {
    echo
    echo "## $s"
    echo
    echo '```'
  } >> "$out"
  timeout 1800 env SWTPU_WARMUP=1 SWTPU_TIME=3 \
    python -m stringwars_tpu.suites.$s --dataset-limit 32mb 2>/dev/null >> "$out"
  rc=$?
  [ $rc -ne 0 ] && echo "(suite exited rc=$rc)" >> "$out"
  echo '```' >> "$out"
done
echo "wrote $out"
