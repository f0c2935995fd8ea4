"""Native (C++) bitstream library tests: exact agreement with the
NumPy/Python reference implementations (SURVEY.md §2.9)."""

import numpy as np
import pytest

from tac import bitstream as bs, huffman as hf, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_unpack_fields_matches_numpy(rng):
    widths = rng.integers(0, 17, 400)
    vals = np.array([rng.integers(0, 1 << w) if w else 0 for w in widths],
                    np.uint64)
    packed = bs.pack_fields(vals, widths)
    ref = bs.unpack_fields(packed, widths)
    nat = native.unpack_fields(np.frombuffer(packed, np.uint8), 0, widths)
    np.testing.assert_array_equal(nat, ref)


def test_pack_fields_matches_numpy(rng):
    widths = rng.integers(0, 17, 400)
    vals = np.array([rng.integers(0, 1 << w) if w else 0 for w in widths],
                    np.int64)
    ref = bs.pack_fields(vals.astype(np.uint64), widths)
    nat = native.pack_fields(vals, widths)
    np.testing.assert_array_equal(nat, ref)


def test_huffman_decode_matches_python(rng):
    m_line = rng.integers(0, 17, 500)
    m_line[m_line == 1] = 0
    mant = np.array([rng.integers(0, 1 << m) if m else 0 for m in m_line])
    vals, wids = hf.encode_fields(mant[None], m_line[None])
    packed = bs.pack_fields(vals.ravel(), wids.ravel())
    bits = np.unpackbits(packed)
    ref, ref_end = hf.decode_lines(bits, 0, m_line)
    nat, nat_end = native.huffman_decode_lines(
        np.frombuffer(packed, np.uint8), 0, m_line)
    np.testing.assert_array_equal(nat, ref)
    assert nat_end == ref_end


def test_native_speedup(rng):
    """The native decode should beat the Python bit walk comfortably."""
    import time

    m_line = np.full(4096, 5)
    mant = rng.integers(0, 32, 4096)
    vals, wids = hf.encode_fields(mant[None], m_line[None])
    packed = bs.pack_fields(vals.ravel(), wids.ravel())
    bits = np.unpackbits(packed)
    raw = np.frombuffer(packed, np.uint8)

    t0 = time.perf_counter()
    for _ in range(3):
        native.huffman_decode_lines(raw, 0, m_line)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    hf.decode_lines(bits, 0, m_line)
    t_py = (time.perf_counter() - t0) * 3
    assert t_nat < t_py
