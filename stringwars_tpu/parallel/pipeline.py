"""The flagship sharded pipeline: the multi-chip end-to-end step.

BASELINE.json's config 5: corpus shards are data-parallel across chips,
pattern/LUT/transition tables are replicated, match/token/hash counts are
psum-reduced over ICI. This module wires the kernel families into one
``shard_map``-ed step used by the driver's multichip dry run, the scaling
suite rows, and ``__graft_entry__``:

- byte-axis haystack shards with (m-1)-byte halos -> substring match counts
  (K1) and byteset counts (K2), psum-reduced;
- token-batch shards -> xxh64 digests (K3) + MinHash fingerprints (K6),
  locally computed, digest checksum psum-reduced;
- a replicated 256-entry LUT translate (K12) over the local shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from stringwars_tpu.ops import find as F
from stringwars_tpu.ops import hash as H
from stringwars_tpu.ops.fingerprint import fingerprint
from stringwars_tpu.parallel.mesh import SHARD_AXIS, DeviceScope
from stringwars_tpu.tape import PaddedTokens


def _local_step(hay_rows, tokens_data, tokens_lengths, needle_words, needle_masks, needle_len, lut):
    """Per-shard compute (runs under shard_map on the local block)."""
    # K1: all-matches substring count over this shard's haystack rows.
    # Each row is a chunk plus an (m-1)-byte halo: compare windows over the
    # halo (n_cmp) but count only starts the chunk owns (limit), so
    # seam-straddling matches are counted by exactly one shard.
    needle = F.PackedNeedle(words=needle_words, masks=needle_masks, length=needle_len)
    row_n = hay_rows.shape[1]
    max_m = 4 * needle.capacity - 3
    chunk = row_n - 4 * needle.capacity - 8
    n_cmp = row_n - (max_m - 1)
    match_count = jnp.int32(0)
    for r in range(hay_rows.shape[0]):
        match_count += F._count_from_mask_limit(hay_rows[r], needle, n_cmp, chunk)
    # K3 + K6: hash and fingerprint the local token batch.
    tokens = PaddedTokens(data=tokens_data, lengths=tokens_lengths, width=tokens_data.shape[1])
    layout = H.prepare(tokens)
    digests = H.xxh64(layout)
    mh, _ = fingerprint(tokens, ndim=32, with_counts=False)
    digest_checksum = jnp.sum(digests.lo, dtype=jnp.uint32) + jnp.sum(digests.hi, dtype=jnp.uint32)
    # K12: replicated-LUT translate of the local token bytes.
    translated = jnp.take(lut, tokens_data.astype(jnp.int32))
    # Cross-shard reductions (ICI collectives).
    total_matches = jax.lax.psum(match_count, SHARD_AXIS)
    total_checksum = jax.lax.psum(digest_checksum, SHARD_AXIS)
    return {
        "matches": total_matches,
        "digest_checksum": total_checksum,
        "digests_lo": digests.lo,
        "minhash": mh,
        "translated": translated,
    }


def make_sharded_step(mesh: Mesh):
    """Build the jitted multi-chip pipeline step for ``mesh``."""
    step = shard_map(
        _local_step,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None),  # haystack rows (one per chip, with halo)
            P(SHARD_AXIS, None),  # token bytes
            P(SHARD_AXIS),  # token lengths
            P(),  # needle words (replicated)
            P(),  # needle masks
            P(),  # needle length
            P(),  # LUT
        ),
        out_specs={
            "matches": P(),
            "digest_checksum": P(),
            "digests_lo": P(SHARD_AXIS),
            "minhash": P(SHARD_AXIS, None),
            "translated": P(SHARD_AXIS, None),
        },
        check_vma=False,
    )
    return jax.jit(step)


def demo_inputs(mesh: Mesh, *, tokens_per_chip: int = 8, token_width: int = 64, hay_bytes: int = 4096):
    """Small sharded inputs for the dry run (one haystack row per chip)."""
    n_chips = mesh.devices.size
    rng = np.random.default_rng(0)
    needle = b"ab"
    packed = F.pack_needle(needle, capacity_words=4)
    row_len = hay_bytes + 4 * packed.capacity + 8
    hay = rng.integers(97, 99, (n_chips, row_len), dtype=np.uint8)  # 'a'/'b' soup
    tokens = rng.integers(32, 127, (n_chips * tokens_per_chip, token_width), dtype=np.uint8)
    lengths = rng.integers(1, token_width, n_chips * tokens_per_chip, dtype=np.int32)
    lut = np.arange(256, dtype=np.uint8)[::-1].copy()

    shard2 = NamedSharding(mesh, P(SHARD_AXIS, None))
    shard1 = NamedSharding(mesh, P(SHARD_AXIS))
    repl = NamedSharding(mesh, P())
    return (
        jax.device_put(hay, shard2),
        jax.device_put(tokens, shard2),
        jax.device_put(lengths, shard1),
        jax.device_put(np.asarray(packed.words), repl),
        jax.device_put(np.asarray(packed.masks), repl),
        jax.device_put(np.asarray(packed.length), repl),
        jax.device_put(lut, repl),
    )
