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


def test_truncated_stream_raises(rng):
    """Untrusted-input contract: reads past the payload end must raise
    CorruptStreamError (both the native path and the Python fallback),
    never read out of bounds or return garbage."""
    m_line = np.full(64, 6)
    mant = rng.integers(0, 64, 64)
    vals, wids = hf.encode_fields(mant[None], m_line[None])
    packed = bs.pack_fields(vals.ravel(), wids.ravel())
    truncated = np.frombuffer(packed, np.uint8)[: max(1, len(packed) // 4)]
    with pytest.raises(native.CorruptStreamError):
        native.huffman_decode_lines(truncated, 0, m_line)
    with pytest.raises(native.CorruptStreamError):
        hf.decode_lines(np.unpackbits(truncated), 0, m_line)

    widths = np.full(100, 16, np.int64)
    with pytest.raises(native.CorruptStreamError):
        native.unpack_fields(truncated, 0, widths)


def test_exact_end_is_legal(rng):
    """A stream whose last field ends exactly at the buffer end decodes."""
    widths = np.array([16, 7, 9], np.int64)   # 32 bits = 4 bytes, no slack
    vals = np.array([65535, 127, 511], np.uint64)
    packed = bs.pack_fields(vals, widths)
    assert len(packed) == 4
    out = native.unpack_fields(np.frombuffer(packed, np.uint8), 0, widths)
    np.testing.assert_array_equal(out, vals.astype(np.int64))


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
