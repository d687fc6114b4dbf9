"""Worker process for tests/test_multihost.py: one simulated host.

Each worker = one jax process with 4 virtual CPU devices; two workers form
a (2-host x 4-chip) cluster over Gloo collectives. The worker loads ONLY
its own byte range of the (deterministically synthesized) global corpus,
assembles the global halo rows with ``shard_bytes_local``, runs the same
shard_map + psum find program the find suite uses, and prints the global
match count + its scope name for the parent test to check.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

# Join the process group BEFORE importing ops modules (they build jnp
# constants at import time, which would initialize the backend early).
from stringwars_tpu.parallel.distributed import (  # noqa: E402
    host_byte_range,
    maybe_initialize,
    shard_bytes_local,
)

_IS_MULTI = maybe_initialize()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from stringwars_tpu.ops import find as F  # noqa: E402
from stringwars_tpu.parallel.mesh import SHARD_AXIS, make_mesh  # noqa: E402


def main() -> None:
    assert _IS_MULTI, "expected multi-process env"
    scope = make_mesh()
    needle_bytes = b"abra"
    cap = 4
    overlap = 8 * cap

    n = 1 << 20
    rng = np.random.default_rng(7)
    corpus = rng.integers(97, 99, n, dtype=np.uint8)  # a/b soup: many matches
    offset, length, _chunk = host_byte_range(n, overlap=overlap)
    local = corpus[offset : offset + length]

    rows, n_glob, chunk = shard_bytes_local(scope, local, n, overlap=overlap)
    row_len = chunk + overlap
    max_m = 4 * cap - 3
    n_cmp = row_len - max_m + 1
    needle = F.pack_needle(needle_bytes, cap)
    words = jax.device_put(np.asarray(needle.words), scope.replicated)
    masks = jax.device_put(np.asarray(needle.masks), scope.replicated)
    nlen = jax.device_put(np.asarray(needle.length), scope.replicated)

    def local_step(rows_blk, words, masks, length):
        pn = F.PackedNeedle(words=words, masks=masks, length=length)
        lo = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32) * chunk
        count = F._count_from_mask_sharded(
            rows_blk[0], pn, n_cmp, jnp.int32(chunk), lo, jnp.int32(n_glob)
        )
        return jax.lax.psum(count, SHARD_AXIS)

    step = jax.jit(
        shard_map(
            local_step,
            mesh=scope.mesh,
            in_specs=(P(SHARD_AXIS, None), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    count = int(step(rows, words, masks, nlen))

    # Oracle on the full corpus (the test checks both workers agree with it).
    blob = corpus.tobytes()
    want = 0
    pos = 0
    while True:
        pos = blob.find(needle_bytes, pos)
        if pos < 0:
            break
        want += 1
        pos += 1

    print(f"RESULT scope={scope.name} count={count} want={want}", flush=True)
    assert count == want, (count, want)


if __name__ == "__main__":
    sys.exit(main())
