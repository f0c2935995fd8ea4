"""Property-based fuzzing (hypothesis) of the integer-exact layers:
quantizers, bit packing, Huffman, and allocation invariants (SPEC.md §10:
these layers must be bit-exact by construction, so they get the heaviest
randomized coverage)."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from tac import bands, bitstream as bs, huffman as hf, quant
from tac.oracle import bitalloc as oba, quantize as oq

_settings = settings(max_examples=60, deadline=None)


@_settings
@given(st.floats(-1.0, 1.0, allow_nan=False), st.integers(2, 16))
def test_quantize_roundtrip_error_bound(a, r):
    c = oq.QuantizeUniform(a, r)
    back = oq.DequantizeUniform(c, r)
    assert abs(back - a) <= 1.0 / (2 ** r - 1) + 1e-12
    assert 0 <= c < 2 ** r


@_settings
@given(st.floats(-4.0, 4.0, allow_nan=False), st.integers(0, 16))
def test_block_fp_roundtrip_never_crashes(a, m):
    s = 4
    sf = oq.ScaleFactor(abs(a), s, m)
    assert 0 <= sf <= 15
    q = oq.Mantissa(a, sf, s, m)
    x = oq.DequantizeMantissa(q, sf, s, m)
    assert np.isfinite(x)
    if m >= 2 and abs(a) <= 1.0:
        assert abs(x - a) <= 2.0 ** (-(sf + m - 1)) + 1e-12


@_settings
@given(st.lists(st.integers(0, 16), min_size=1, max_size=120),
       st.integers(0, 2))
def test_pack_unpack_roundtrip(widths, seed):
    rng = np.random.default_rng(seed)
    widths = np.asarray(widths, np.int64)
    vals = np.array([rng.integers(0, 1 << w) if w else 0 for w in widths],
                    np.int64)
    packed = bs.pack_fields(vals.astype(np.uint64), widths)
    out = bs.unpack_fields(packed, widths)
    np.testing.assert_array_equal(out, vals)


@_settings
@given(st.integers(0, 3), st.integers(0, 6000))
def test_bitalloc_jax_oracle_agree(seed, budget):
    rng = np.random.default_rng(seed * 7919 + budget)
    nl = bands.lines_per_band(44100, 1024)
    smr = oba.snap_smr(rng.uniform(-60, 90, bands.N_BANDS))
    a_o = oba.BitAlloc(budget, 16, bands.N_BANDS, nl, smr)
    a_j = np.asarray(__import__("tac.bitalloc", fromlist=["x"])
                     .water_fill(jnp.asarray(smr), nl, budget))
    np.testing.assert_array_equal(a_j, a_o)
    assert int((a_o * nl).sum()) <= budget
    assert np.all((a_o == 0) | (a_o >= 2))


@_settings
@given(st.lists(st.sampled_from([0, 2, 3, 4, 5, 6, 7, 8, 12, 16]),
                min_size=1, max_size=80),
       st.integers(0, 2))
def test_huffman_fields_roundtrip(m_list, seed):
    rng = np.random.default_rng(seed)
    m_line = np.asarray(m_list)
    mant = np.array([rng.integers(0, 1 << m) if m else 0 for m in m_line])
    vals, wids = hf.encode_fields(mant[None], m_line[None])
    packed = bs.pack_fields(vals.ravel(), wids.ravel())
    out, end = hf.decode_lines(np.unpackbits(packed), 0, m_line)
    np.testing.assert_array_equal(out, mant)
    assert end == int(wids.sum())


@_settings
@given(st.integers(0, 5))
def test_device_pack_matches_host(seed):
    from tac.ops import bitpack as dbp
    rng = np.random.default_rng(seed)
    nf = int(rng.integers(1, 150))
    wids = rng.integers(0, 17, nf)
    vals = np.array([rng.integers(0, 1 << w) if w else 0 for w in wids],
                    np.int64)
    words, nbits = dbp.pack_rows(jnp.asarray(vals[None], jnp.int32),
                                 jnp.asarray(wids[None], jnp.int32),
                                 int(wids.sum()) + 32)
    blob = dbp.rows_to_bytes(np.asarray(words), np.asarray(nbits))[0]
    expect = bs.pack_fields(vals.astype(np.uint64), wids).tobytes()
    assert blob == expect
