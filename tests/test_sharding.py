"""Multi-chip sharded pipeline conformance on the 8-device virtual mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from stringwars_tpu.parallel.pipeline import demo_inputs, make_sharded_step


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_pipeline_matches_replay(n_devices):
    devices = jax.devices()
    if len(devices) < n_devices:
        pytest.skip("needs virtual multi-device mesh")
    mesh = Mesh(np.array(devices[:n_devices]), ("shard",))
    inputs, ac_n, ac_chunk = demo_inputs(mesh)
    step = make_sharded_step(mesh, ac_n=ac_n, ac_chunk=ac_chunk)
    out = jax.block_until_ready(step(*inputs))

    from stringwars_tpu.ops import hash as H
    from stringwars_tpu.tape import PaddedTokens
    import jax.numpy as jnp

    tokens_data = np.asarray(inputs[1])
    lengths = np.asarray(inputs[2])
    toks = PaddedTokens(
        data=jnp.asarray(tokens_data), lengths=jnp.asarray(lengths), width=tokens_data.shape[1]
    )
    digests = H.xxh64(H.prepare(toks))
    want = int(
        (np.asarray(digests.lo).astype(np.uint64).sum() + np.asarray(digests.hi).astype(np.uint64).sum())
        & 0xFFFFFFFF
    )
    assert int(out["digest_checksum"]) == want
    assert int(out["matches"]) > 0
    # Per-shard digest gather covers every token once.
    np.testing.assert_array_equal(
        np.sort(np.asarray(out["digests_lo"])), np.sort(np.asarray(digests.lo))
    )


def test_pipeline_match_count_exact_at_seams():
    """The sharded pipeline's K1 count equals the global all-matches count,
    including matches straddling shard seams (regression: window starts in
    the last m-1 bytes of each chunk used to be dropped)."""
    import re

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stringwars_tpu.ops import find as F
    from stringwars_tpu.parallel.pipeline import make_sharded_step

    n_chips = 4
    devices = jax.devices()
    if len(devices) < n_chips:
        pytest.skip("needs virtual multi-device mesh")
    mesh = Mesh(np.array(devices[:n_chips]), ("shard",))

    rng = np.random.default_rng(11)
    packed = F.pack_needle(b"abab", 4)
    chunk = 1024
    pad = 4 * packed.capacity + 8
    buf = np.zeros(n_chips * chunk + pad, np.uint8)
    data = rng.choice(np.frombuffer(b"ab", np.uint8), n_chips * chunk)
    # Force a match exactly across every seam.
    for r in range(1, n_chips):
        data[r * chunk - 2 : r * chunk + 2] = np.frombuffer(b"abab", np.uint8)
    buf[: data.size] = data
    rows = np.lib.stride_tricks.sliding_window_view(buf, chunk + pad)[::chunk][:n_chips]

    tokens = rng.integers(97, 123, (n_chips * 4, 32), dtype=np.uint8)
    lengths = rng.integers(1, 32, n_chips * 4, dtype=np.int32)
    from stringwars_tpu.parallel.pipeline import _pipeline_inputs
    from jax.sharding import NamedSharding as NS

    inputs, _p, ac_n, ac_chunk = _pipeline_inputs(
        mesh, data, tokens, lengths, needle=b"abab"
    )
    step = make_sharded_step(mesh, ac_n=ac_n, ac_chunk=ac_chunk)
    shard2 = NS(mesh, P("shard", None))
    out = step(jax.device_put(np.ascontiguousarray(rows), shard2), *inputs)
    want = len(re.findall(b"(?=abab)", data.tobytes()))
    assert int(out["matches"]) == want


def test_shard_bytes_halo_find():
    """Byte-axis sharding with halos: no matches lost at shard seams."""
    from stringwars_tpu.parallel.mesh import make_mesh
    from stringwars_tpu.parallel.sharding import shard_bytes
    from stringwars_tpu.ops import find as F
    import re

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device mesh")
    make_mesh.cache_clear()
    scope = make_mesh(4)
    rng = np.random.default_rng(5)
    hay = rng.choice(np.frombuffer(b"ab", np.uint8), 40_000)
    needle = b"abab"
    packed = F.pack_needle(needle, 4)
    rows, n, chunk = shard_bytes(scope, hay, overlap=len(needle) - 1, align=512)
    rows_np = np.asarray(rows)
    total = 0
    for r in range(rows_np.shape[0]):
        lo = r * chunk
        valid = max(min(n - lo, chunk + len(needle) - 1), 0)
        if valid <= 0:
            continue
        row = rows_np[r]
        count = int(F.find_count(row, packed, valid))
        total += count
    want = len(re.findall(b"(?=abab)", hay.tobytes()))
    assert total == want
