"""Conformance: ops/lut.py lane-gather LUTs vs plain jnp.take."""

import jax.numpy as jnp
import numpy as np
import pytest

from stringwars_tpu.ops import lut


@pytest.mark.parametrize("size", [1, 100, 128, 300, 1280, 4000])
def test_lut_map_matches_take(size):
    rng = np.random.default_rng(size)
    table = rng.integers(-(2**30), 2**30, size).astype(np.int32)
    idx = rng.integers(0, size, 70_000).astype(np.int32)
    got = np.asarray(lut.lut_map(jnp.asarray(idx), table, interpret=True))
    np.testing.assert_array_equal(got, table[idx])


def test_lut_map_shapes_preserved():
    table = np.arange(256, dtype=np.int32) * 3
    idx = np.arange(2 * 5 * 7, dtype=np.int32).reshape(2, 5, 7) % 256
    got = np.asarray(lut.lut_map(jnp.asarray(idx), table, interpret=True))
    assert got.shape == (2, 5, 7)
    np.testing.assert_array_equal(got, table[idx])


def test_paged_tables_roundtrip():
    rng = np.random.default_rng(7)
    # sparse-ish table: mostly zero pages, a few dense spots (fold-like)
    table = np.zeros(0x10000, np.int32)
    hot = rng.integers(0, 0x600, 500)
    table[hot] = rng.integers(1, 99, 500)
    table[0x1E00:0x1F00] = 7
    pm, pg = lut.paged_lut_tables(table)
    assert pm.shape[0] % lut.WINDOW == 0 and pg.shape[0] % lut.WINDOW == 0
    idx = rng.integers(0, 0x10000, 50_000)
    got = pg[(pm[idx >> 8] << 8) | (idx & 255)]
    np.testing.assert_array_equal(got, table[idx])
    # dedup actually compresses: identical zero pages collapse
    assert pg.shape[0] < table.shape[0] // 4


def test_replicate8_pads_to_window():
    t = np.arange(300, dtype=np.int32)
    r8 = np.asarray(lut.replicate8(t))
    assert r8.shape == (8, 384)
    np.testing.assert_array_equal(r8[3, :300], t)
    assert (r8[:, 300:] == 0).all()
