"""ctypes bridge to the native host bitstream library (native/tacbits.cpp).

Loads `native/libtacbits.so`, building it with make on first use if a
compiler is available; every entry point has a pure-NumPy/Python fallback,
so the package works without a toolchain (SURVEY.md §2.9: the bitstream
walk is the one justified native component — serial, bit-granular,
host-side).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native")
_SO = os.path.join(_DIR, "libtacbits.so")

_i8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


@lru_cache(maxsize=1)
def _lib():
    """Load (building if needed) the shared library; None on failure."""
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], capture_output=True,
                           timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.tac_unpack_fields.argtypes = [_i8p, ctypes.c_int64, ctypes.c_int64,
                                      _i32p, ctypes.c_int64, _i64p]
    lib.tac_unpack_fields.restype = ctypes.c_int64
    lib.tac_huffman_decode_lines.argtypes = [
        _i8p, ctypes.c_int64, ctypes.c_int64, _i32p, ctypes.c_int64,
        _i32p, _i32p, _i64p, _i32p, _i32p, _i64p]
    lib.tac_huffman_decode_lines.restype = ctypes.c_int64
    lib.tac_pack_fields.argtypes = [_i64p, _i32p, ctypes.c_int64, _i8p]
    lib.tac_pack_fields.restype = ctypes.c_int64
    lib.tac_split_blocks.argtypes = [_i8p, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, _i64p, _i64p]
    lib.tac_split_blocks.restype = ctypes.c_int64
    return lib


def available() -> bool:
    return _lib() is not None


class CorruptStreamError(ValueError):
    """A decode read ran past the end of the payload buffer."""


def unpack_fields(data: np.ndarray, bit_offset: int,
                  widths: np.ndarray) -> np.ndarray:
    """Sequential field reads from a byte buffer (native; None-safe).

    Raises CorruptStreamError if the fields run past the buffer end
    (truncated or malformed stream)."""
    lib = _lib()
    widths = np.ascontiguousarray(widths, np.int32)
    out = np.empty(len(widths), np.int64)
    data = np.ascontiguousarray(data, np.uint8)
    if lib is None:
        from tac import bitstream as bs
        if bit_offset + int(widths.sum()) > 8 * len(data):
            raise CorruptStreamError("field walk past end of payload")
        return bs.unpack_fields(data, widths.astype(np.int64), bit_offset)
    end = lib.tac_unpack_fields(data, 8 * len(data), bit_offset, widths,
                                len(widths), out)
    if end < 0:
        raise CorruptStreamError("field walk past end of payload")
    return out


@lru_cache(maxsize=4)
def _huffman_luts_packed(set_id: int = 1):
    """Concatenate the per-m peek LUTs into flat arrays for the C call."""
    from tac import huffman as hf

    luts = hf._dec_luts(set_id)
    syms, lens, offs, bits, escs = [], [], [], [], []
    off = 0
    for m in range(hf.MIN_M, hf.MAX_M + 1):
        sym_lut, len_lut, L, esc = luts[m]
        syms.append(sym_lut)
        lens.append(len_lut)
        offs.append(off)
        bits.append(L)
        escs.append(esc)
        off += len(sym_lut)
    return (np.ascontiguousarray(np.concatenate(syms), np.int32),
            np.ascontiguousarray(np.concatenate(lens), np.int32),
            np.ascontiguousarray(np.asarray(offs), np.int64),
            np.ascontiguousarray(np.asarray(bits), np.int32),
            np.ascontiguousarray(np.asarray(escs), np.int32))


def huffman_decode_lines(data_bytes: np.ndarray, start_bit: int,
                         m_per_line: np.ndarray, set_id: int = 1
                         ) -> tuple[np.ndarray, int]:
    """Native canonical-Huffman mantissa decode (SPEC.md §8).

    data_bytes: uint8 byte buffer; returns (mant[h], end_bit). set_id
    picks the trained table set (the C walk is table-agnostic — the LUTs
    are call arguments).
    """
    lib = _lib()
    if lib is None:
        from tac import huffman as hf
        bits = np.unpackbits(np.ascontiguousarray(data_bytes, np.uint8))
        return hf.decode_lines(bits, start_bit, m_per_line, set_id)
    sym, lens, offs, bits_, escs = _huffman_luts_packed(set_id)
    m = np.ascontiguousarray(m_per_line, np.int32)
    out = np.empty(len(m), np.int64)
    data = np.ascontiguousarray(data_bytes, np.uint8)
    end = lib.tac_huffman_decode_lines(data, start_bit, len(data) * 8,
                                       m, len(m), sym, lens, offs, bits_,
                                       escs, out)
    if end < 0:
        raise CorruptStreamError("huffman mantissa walk past end of payload")
    return out, int(end)


def split_blocks(data, offset: int, k: int):
    """Walk k u16-prefixed payloads (native container framing walk).

    Returns (offs int64[k], lens int64[k]); raises CorruptStreamError if a
    prefix or payload crosses the buffer end. Falls back to a bounds-checked
    Python loop without the toolchain.
    """
    buf = np.ascontiguousarray(np.frombuffer(data, np.uint8)
                               if isinstance(data, (bytes, bytearray))
                               else data, np.uint8)
    lib = _lib()
    offs = np.empty(k, np.int64)
    lens = np.empty(k, np.int64)
    if lib is not None:
        end = lib.tac_split_blocks(buf, len(buf), offset, k, offs, lens)
        if end < 0:
            raise CorruptStreamError("block framing past end of stream")
        return offs, lens
    o = offset
    n = len(buf)
    for i in range(k):
        if o + 2 > n:
            raise CorruptStreamError("block framing past end of stream")
        lens[i] = int(buf[o]) | (int(buf[o + 1]) << 8)
        offs[i] = o + 2
        o += 2 + int(lens[i])
        if o > n:
            raise CorruptStreamError("block framing past end of stream")
    return offs, lens


def pack_fields(vals: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Native MSB-first packer (host fallback path)."""
    lib = _lib()
    if lib is None:
        from tac import bitstream as bs
        return bs.pack_fields(vals.astype(np.uint64),
                              widths.astype(np.int64))
    vals = np.ascontiguousarray(vals, np.int64)
    widths = np.ascontiguousarray(widths, np.int32)
    total = int(widths.sum())
    out = np.zeros(-(-total // 8), np.uint8)
    lib.tac_pack_fields(vals, widths, len(vals), out)
    return out
