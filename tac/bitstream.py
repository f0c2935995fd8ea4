"""PAC-T bitstream: vectorized bit packing and the coded-file container.

Capability parity with the reference's ``bitpack.py`` + ``pacfile.py``
(SURVEY.md §2 #8, #3: PackedBits MSB-first bit I/O; PACFile header/payload
layout), redesigned host-side-vectorized: the reference writes every field
bit-by-bit in interpreted Python (its #1 hot loop, SURVEY.md §3.1); here the
whole clip's field stream is packed in ~10 NumPy ops via
repeat/cumsum/packbits. A C++ packer can drop in behind the same interface if
profiles ever show this on the critical path (SURVEY.md §2.9).

Format: SPEC.md §7. All fields MSB-first; header little-endian.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"PACT"
VERSION = 1
FLAG_HUFFMAN = 1
FLAG_BLOCKSWITCH = 2
FLAG_MS = 4          # mid/side pairs: decode applies L = M+S, R = M−S
                     # to each adjacent channel pair (SPEC.md §11)


# ----------------------------------------------------------- bit packing ----

def pack_fields(values: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Pack (value, width) fields MSB-first into a byte array.

    values: uint64/int64[M] (each < 2**width); widths: int[M] (0 allowed:
    zero-width fields contribute nothing — used for alloc=0 holes).
    Returns uint8[ceil(total_bits/8)]; the total is expected to be a byte
    multiple when per-frame pad fields are included by the caller.
    """
    values = np.asarray(values, np.uint64)
    widths = np.asarray(widths, np.int64)
    total = int(widths.sum())
    if total == 0:
        return np.zeros(0, np.uint8)
    fid = np.repeat(np.arange(len(widths)), widths)
    end = np.cumsum(widths)
    pos = np.arange(total, dtype=np.int64) - (end[fid] - widths[fid])
    shift = (widths[fid] - 1 - pos).astype(np.uint64)
    bits = ((values[fid] >> shift) & np.uint64(1)).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
    return np.packbits(bits)


def unpack_at(bits: np.ndarray, offsets: np.ndarray,
              widths: np.ndarray) -> np.ndarray:
    """Read fields at absolute bit offsets from an unpacked bit array.

    bits: uint8[nbits] (np.unpackbits output); offsets/widths: int64[M].
    Returns int64[M]. Zero-width fields read 0. Vectorized: one gather +
    one segment-sum over the field id.
    """
    offsets = np.asarray(offsets, np.int64)
    widths = np.asarray(widths, np.int64)
    m = len(widths)
    total = int(widths.sum())
    if total == 0:
        return np.zeros(m, np.int64)
    fid = np.repeat(np.arange(m), widths)
    end = np.cumsum(widths)
    pos = np.arange(total, dtype=np.int64) - (end[fid] - widths[fid])
    idx = offsets[fid] + pos
    if idx.size and (int(idx.min()) < 0 or int(idx.max()) >= len(bits)):
        # corrupt offsets (bad alloc fields / truncated payload) land here;
        # typed error, not a numpy IndexError (tests/test_fuzz.py)
        from tac.native import CorruptStreamError
        raise CorruptStreamError("field read past end of payload")
    b = bits[idx].astype(np.int64)
    weight = np.int64(1) << (widths[fid] - 1 - pos)
    vals = np.bincount(fid, weights=(b * weight).astype(np.float64),
                       minlength=m)
    return vals.astype(np.int64)


def unpack_fields(data: np.ndarray, widths: np.ndarray,
                  bit_offset: int = 0) -> np.ndarray:
    """Sequential-field convenience wrapper over unpack_at."""
    widths = np.asarray(widths, np.int64)
    end = np.cumsum(widths) + bit_offset
    offsets = end - widths
    bits = np.unpackbits(np.asarray(data, np.uint8))
    return unpack_at(bits, offsets, widths)


# -------------------------------------------------------------- container ---

@dataclass
class PacHeader:
    """Parsed PAC-T header (SPEC.md §7)."""
    sample_rate: int
    n_channels: int
    num_samples: int            # per channel
    bitrate_bps: int
    n_mdct_lines: int
    n_mdct_lines_short: int
    n_scale_bits: int
    n_mant_size_bits: int
    n_lines_long: np.ndarray    # int[nBandsLong]
    n_lines_short: np.ndarray | None
    huffman: bool
    blockswitch: bool
    ms: bool = False            # mid/side stereo (SPEC.md §11)


def write_header(h: PacHeader) -> bytes:
    flags = (FLAG_HUFFMAN if h.huffman else 0) | \
            (FLAG_BLOCKSWITCH if h.blockswitch else 0) | \
            (FLAG_MS if h.ms else 0)
    out = [MAGIC,
           struct.pack("<HHIHQIHHBBB", VERSION, flags, h.sample_rate,
                       h.n_channels, h.num_samples, h.bitrate_bps,
                       h.n_mdct_lines, h.n_mdct_lines_short,
                       h.n_scale_bits, h.n_mant_size_bits,
                       len(h.n_lines_long)),
           np.asarray(h.n_lines_long, "<u2").tobytes()]
    if h.blockswitch:
        out.append(struct.pack("<B", len(h.n_lines_short)))
        out.append(np.asarray(h.n_lines_short, "<u2").tobytes())
    return b"".join(out)


def read_header(data: bytes) -> tuple[PacHeader, int]:
    """Parse a PAC-T header; returns (header, byte offset of first block)."""
    if data[:4] != MAGIC:
        raise ValueError("not a PAC-T stream (bad magic)")
    off = 4
    (ver, flags, fs, nch, nsamp, bps, h_long, h_short, sbits, abits,
     nbl) = struct.unpack_from("<HHIHQIHHBBB", data, off)
    if ver != VERSION:
        raise ValueError(f"unsupported PAC-T version {ver}")
    off += struct.calcsize("<HHIHQIHHBBB")
    n_lines_long = np.frombuffer(data, "<u2", nbl, off).astype(np.int32)
    off += 2 * nbl
    n_lines_short = None
    if flags & FLAG_BLOCKSWITCH:
        (nbs,) = struct.unpack_from("<B", data, off)
        off += 1
        n_lines_short = np.frombuffer(data, "<u2", nbs, off).astype(np.int32)
        off += 2 * nbs
    if flags & FLAG_MS and nch % 2:
        raise ValueError("mid/side flag on an odd-channel stream "
                         "(corrupt header)")
    hdr = PacHeader(sample_rate=fs, n_channels=nch, num_samples=nsamp,
                    bitrate_bps=bps, n_mdct_lines=h_long,
                    n_mdct_lines_short=h_short, n_scale_bits=sbits,
                    n_mant_size_bits=abits, n_lines_long=n_lines_long,
                    n_lines_short=n_lines_short,
                    huffman=bool(flags & FLAG_HUFFMAN),
                    blockswitch=bool(flags & FLAG_BLOCKSWITCH),
                    ms=bool(flags & FLAG_MS))
    return hdr, off


def assemble_blocks(payloads: np.ndarray, nbytes: np.ndarray) -> bytes:
    """Interleave u16 length prefixes with per-(block,channel) payloads.

    payloads: uint8[total] — all payload bytes back to back, in stream order;
    nbytes: int[K] — length of each payload.
    """
    nbytes = np.asarray(nbytes, np.int64)
    k = len(nbytes)
    total = int(nbytes.sum()) + 2 * k
    out = np.empty(total, np.uint8)
    # destination offset of each payload (after its 2-byte prefix)
    dst_end = np.cumsum(nbytes + 2)
    dst_start = dst_end - nbytes          # payload start
    # write prefixes
    pfx = dst_start - 2
    le = nbytes.astype("<u2").view(np.uint8).reshape(-1, 2)
    out[pfx] = le[:, 0]
    out[pfx + 1] = le[:, 1]
    # scatter payload bytes: source index -> dest index via repeat/cumsum
    src_end = np.cumsum(nbytes)
    fid = np.repeat(np.arange(k), nbytes)
    pos = np.arange(int(src_end[-1]), dtype=np.int64) - (src_end[fid] - nbytes[fid])
    out[dst_start[fid] + pos] = payloads
    return out.tobytes()


def split_blocks(data: bytes, offset: int, k: int):
    """Inverse of assemble_blocks: returns (payload_byte_offsets, nbytes).

    Walks K u16-prefixed payloads starting at `offset` (the chained length
    prefixes force a sequential walk — done in native C, with a
    bounds-checked Python fallback; raises CorruptStreamError on truncated
    or malformed framing). Offsets index into `data` (absolute).
    """
    from tac import native
    return native.split_blocks(data, offset, k)
