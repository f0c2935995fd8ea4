"""Invariants behind the round-3 perf rewrites (PERF.md):

* DEC_TABLE[k] == fl32(6.02) * k for every k — the one-multiply dec_of
  in the Pallas kernels relies on it (tac/ops/pallas_alloc._dec_of);
* band_slice_max == segment_max and band_slice_sum == segment_sum
  (int) over the static band map, including the grouped-short tiling.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tac import bands
from tac import bitalloc as ba
from tac import psy


def test_dec_table_is_exact_multiple():
    dec32 = np.asarray(ba.DEC_TABLE, np.float32)
    alt = np.float32(ba.DB_PER_BIT) * np.arange(ba.MANT_MAX + 1,
                                                dtype=np.float32)
    np.testing.assert_array_equal(dec32, alt)


@pytest.mark.parametrize("fs,h", [(44100, 1024), (16000, 512), (44100, 256)])
def test_band_slice_reductions_match_segment_ops(fs, h):
    ranges = bands.band_line_ranges(fs, h)
    bol = jnp.asarray(bands.band_of_line(fs, h))
    nb = bands.N_BANDS
    rng = np.random.default_rng(h)
    x = jnp.asarray(rng.normal(size=(6, h)), jnp.float32)
    xi = jnp.asarray(rng.integers(0, 1000, (6, h)), jnp.int32)

    want_max = jax.vmap(lambda r: jax.ops.segment_max(
        r, bol, num_segments=nb))(x)
    got_max = psy.band_slice_max(x, ranges, -jnp.inf)
    np.testing.assert_array_equal(np.asarray(want_max), np.asarray(got_max))

    want_sum = jax.vmap(lambda r: jax.ops.segment_sum(
        r, bol, num_segments=nb))(xi)
    got_sum = psy.band_slice_sum(xi, ranges)
    np.testing.assert_array_equal(np.asarray(want_sum), np.asarray(got_sum))


def test_band_tile_grouped_reduction_matches_tiled_segment_map():
    """The grouped-short consts reduce over a TILED band map (K sub-blocks
    x short map); _band_max/_band_sum reshape per sub-block and combine."""
    from tac import codec
    from tac.config import PRESETS

    cfg = PRESETS["stereo44-128"]
    hs, k = 256, 4
    ranges = bands.band_line_ranges(cfg.sample_rate, hs)
    bol_s = bands.band_of_line(cfg.sample_rate, hs)
    bol_g = jnp.asarray(np.tile(bol_s, k))
    nb = bands.N_BANDS
    c = codec.make_consts(cfg)._replace(
        band_ranges=ranges, band_tile=k,
        band_of_line=bol_g,
        n_lines=jnp.asarray(k * bands.lines_per_band(cfg.sample_rate, hs)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, k * hs)), jnp.float32)
    xi = jnp.asarray(rng.integers(0, 1000, (5, k * hs)), jnp.int32)

    want_max = jax.vmap(lambda r: jax.ops.segment_max(
        r, bol_g, num_segments=nb))(x)
    got_max = codec._band_max(x, c, -jnp.inf)
    np.testing.assert_array_equal(np.asarray(want_max), np.asarray(got_max))

    want_sum = jax.vmap(lambda r: jax.ops.segment_sum(
        r, bol_g, num_segments=nb))(xi)
    got_sum = codec._band_sum(xi, c)
    np.testing.assert_array_equal(np.asarray(want_sum), np.asarray(got_sum))
