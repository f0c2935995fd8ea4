"""PackedBits: MSB-first bit-level pack/unpack, one field at a time.

Oracle counterpart of the reference's ``bitpack.py`` (SURVEY.md §2 #8).
Deliberately serial/interpreted — this is the reference's #1 hot loop
(SURVEY.md §3.1) and part of the measured baseline this package provides.
Format contract: SPEC.md §7 (all payload fields MSB-first).
"""

from __future__ import annotations


class PackedBits:
    """A byte buffer with bit-granular sequential read/write pointers."""

    def __init__(self):
        self._bytes = bytearray()
        self._wbit = 0   # write pointer (absolute bit index)
        self._rbit = 0   # read pointer

    def Size(self, n_bytes: int) -> None:
        """Allocate a zeroed buffer of n_bytes and reset pointers."""
        self._bytes = bytearray(n_bytes)
        self.ResetPointers()

    def ResetPointers(self) -> None:
        self._wbit = 0
        self._rbit = 0

    def WriteBits(self, value: int, n_bits: int) -> None:
        """Append the low n_bits of value, MSB first."""
        for i in range(n_bits - 1, -1, -1):
            bit = (value >> i) & 1
            byte_i, off = divmod(self._wbit, 8)
            if byte_i >= len(self._bytes):
                self._bytes.append(0)
            if bit:
                self._bytes[byte_i] |= 0x80 >> off
            self._wbit += 1

    def ReadBits(self, n_bits: int) -> int:
        """Read n_bits MSB-first from the read pointer."""
        v = 0
        for _ in range(n_bits):
            byte_i, off = divmod(self._rbit, 8)
            v = (v << 1) | ((self._bytes[byte_i] >> (7 - off)) & 1)
            self._rbit += 1
        return v

    def SetPackedData(self, data: bytes) -> None:
        self._bytes = bytearray(data)
        self.ResetPointers()

    def GetPackedData(self) -> bytes:
        return bytes(self._bytes)

    def nBytes(self) -> int:
        return len(self._bytes)
