"""Bitstream tests: vectorized pack/unpack fuzz + PackedBits equivalence
(SURVEY.md §4 item 2: PackedBits round-trip fuzz)."""

import numpy as np
import pytest

from tac import bitstream as bs
from tac.oracle.bitpack import PackedBits


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pack_fields_matches_packedbits(seed):
    rng = np.random.default_rng(seed)
    widths = rng.integers(0, 17, 300)
    values = np.array([rng.integers(0, 1 << w) if w else 0 for w in widths],
                      np.uint64)
    fast = bs.pack_fields(values, widths)
    pb = PackedBits()
    for v, w in zip(values, widths):
        pb.WriteBits(int(v), int(w))
    slow = np.frombuffer(pb.GetPackedData(), np.uint8)
    # pack_fields zero-pads to the same byte length
    np.testing.assert_array_equal(fast[:len(slow)], slow)


@pytest.mark.parametrize("seed", [3, 4])
def test_unpack_roundtrip(seed):
    rng = np.random.default_rng(seed)
    widths = rng.integers(0, 17, 500)
    values = np.array([rng.integers(0, 1 << w) if w else 0 for w in widths],
                      np.int64)
    packed = bs.pack_fields(values.astype(np.uint64), widths)
    out = bs.unpack_fields(packed, widths)
    np.testing.assert_array_equal(out, values)


def test_unpack_at_absolute_offsets():
    #  fields: 0b101 (3), 0b01 (2), 0b1111 (4) → bits 101 01 1111
    packed = bs.pack_fields(np.array([0b101, 0b01, 0b1111], np.uint64),
                            np.array([3, 2, 4]))
    bits = np.unpackbits(packed)
    vals = bs.unpack_at(bits, np.array([0, 3, 5]), np.array([3, 2, 4]))
    np.testing.assert_array_equal(vals, [0b101, 0b01, 0b1111])
    # re-read just the middle field
    assert bs.unpack_at(bits, np.array([3]), np.array([2]))[0] == 0b01


def test_header_roundtrip():
    h = bs.PacHeader(sample_rate=44100, n_channels=2, num_samples=123457,
                     bitrate_bps=128000, n_mdct_lines=1024,
                     n_mdct_lines_short=0, n_scale_bits=4,
                     n_mant_size_bits=4,
                     n_lines_long=np.arange(25, dtype=np.int32),
                     n_lines_short=None, huffman=False, blockswitch=False)
    data = bs.write_header(h)
    h2, off = bs.read_header(data)
    assert off == len(data)
    assert h2.sample_rate == 44100 and h2.num_samples == 123457
    np.testing.assert_array_equal(h2.n_lines_long, h.n_lines_long)


def test_assemble_split_blocks():
    rng = np.random.default_rng(7)
    nbytes = rng.integers(0, 50, 20)
    payloads = rng.integers(0, 256, int(nbytes.sum())).astype(np.uint8)
    blob = bs.assemble_blocks(payloads, nbytes)
    offs, lens = bs.split_blocks(blob, 0, 20)
    np.testing.assert_array_equal(lens, nbytes)
    got = np.concatenate([np.frombuffer(blob, np.uint8)[o:o + l]
                          for o, l in zip(offs, lens)] or
                         [np.zeros(0, np.uint8)])
    np.testing.assert_array_equal(got, payloads)
