"""PACFile: the coded-file container (oracle, serial). SURVEY.md §2 #3.

Oracle counterpart of the reference's ``pacfile.py``: maintains the 50%-
overlap ``priorBlock`` state on encode and the overlap-add tail on decode,
writes per-(block, channel) u16-length-prefixed payloads bit-by-bit through
PackedBits. The header is the shared PAC-T layout (tac.bitstream, SPEC.md
§7) so oracle and TPU streams are mutually decodable.
"""

from __future__ import annotations

import numpy as np

from tac import bands
from tac import bitstream as bs
from tac.config import CodecConfig
from tac.oracle.audiofile import AudioFile, CodingParams
from tac.oracle.bitpack import PackedBits
from tac.oracle.codec import DecodeSingleChannel, EncodeSingleChannel


def _write_payload(ovs, alloc, scale, mant, cfg: CodecConfig) -> bytes:
    """One channel's payload per SPEC.md §7 (no blockswitch/huffman)."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    pb = PackedBits()
    pb.WriteBits(int(ovs), s)
    for b in range(bands.N_BANDS):
        code = int(alloc[b]) - 1 if alloc[b] > 0 else 0
        pb.WriteBits(code, a)
    for b in range(bands.N_BANDS):
        if alloc[b] > 0:
            pb.WriteBits(int(scale[b]), s)
    for b in range(bands.N_BANDS):
        for m in mant[b]:
            pb.WriteBits(int(m), int(alloc[b]))
    return pb.GetPackedData()


def _read_payload(data: bytes, cfg: CodecConfig):
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    n_lines = bands.lines_per_band(cfg.sample_rate, cfg.n_mdct_lines)
    pb = PackedBits()
    pb.SetPackedData(data)
    ovs = pb.ReadBits(s)
    alloc = np.zeros(bands.N_BANDS, np.int64)
    for b in range(bands.N_BANDS):
        c = pb.ReadBits(a)
        alloc[b] = c + 1 if c > 0 else 0
    scale = np.zeros(bands.N_BANDS, np.int64)
    for b in range(bands.N_BANDS):
        if alloc[b] > 0:
            scale[b] = pb.ReadBits(s)
    mant = []
    for b in range(bands.N_BANDS):
        if alloc[b] > 0:
            mant.append([pb.ReadBits(int(alloc[b]))
                         for _ in range(int(n_lines[b]))])
        else:
            mant.append([])
    return ovs, alloc, scale, mant


class PACFile(AudioFile):
    """PAC-T coded file over the AudioFile block lifecycle."""

    def __init__(self, filename: str, cfg: CodecConfig):
        super().__init__(filename)
        self.cfg = cfg

    # ------------------------------------------------------------ write ----

    def WriteFileHeader(self, cp: CodingParams) -> None:
        cfg = self.cfg
        h = cfg.n_mdct_lines
        hdr = bs.PacHeader(
            sample_rate=cp.sampleRate, n_channels=cp.nChannels,
            num_samples=cp.numSamples, bitrate_bps=cfg.bitrate_bps,
            n_mdct_lines=h,
            n_mdct_lines_short=cfg.n_mdct_lines_short
            if cfg.use_block_switch else 0,
            n_scale_bits=cfg.n_scale_bits,
            n_mant_size_bits=cfg.n_mant_size_bits,
            n_lines_long=bands.lines_per_band(cp.sampleRate, h),
            n_lines_short=None, huffman=cfg.use_huffman,
            blockswitch=cfg.use_block_switch)
        self.fp.write(bs.write_header(hdr))
        self._prior = [np.zeros(h) for _ in range(cp.nChannels)]

    def WriteDataBlock(self, data, cp: CodingParams) -> None:
        """data: list of [H] new samples per channel (the reference's serial
        overlap contract, SURVEY.md §3.1)."""
        for c in range(cp.nChannels):
            full = np.concatenate([self._prior[c], data[c]])
            self._prior[c] = np.asarray(data[c], np.float64).copy()
            payload = _write_payload(*EncodeSingleChannel(full, self.cfg),
                                     self.cfg)
            self.fp.write(len(payload).to_bytes(2, "little"))
            self.fp.write(payload)

    def Close(self, cp: CodingParams) -> None:
        if hasattr(self, "_prior"):  # flush the final overlap tail
            h = self.cfg.n_mdct_lines
            self.WriteDataBlock([np.zeros(h)] * cp.nChannels, cp)
        super().Close(cp)

    # ------------------------------------------------------------- read ----

    def ReadFileHeader(self) -> CodingParams:
        data = self.fp.read()
        hdr, off = bs.read_header(data)
        self._buf = data
        self._off = off
        self.cfg = self.cfg.replace(
            sample_rate=hdr.sample_rate, n_channels=hdr.n_channels,
            bitrate_bps=hdr.bitrate_bps, n_mdct_lines=hdr.n_mdct_lines,
            n_scale_bits=hdr.n_scale_bits,
            n_mant_size_bits=hdr.n_mant_size_bits)
        cp = CodingParams()
        cp.sampleRate = hdr.sample_rate
        cp.nChannels = hdr.n_channels
        cp.numSamples = hdr.num_samples
        h = hdr.n_mdct_lines
        self._tail = [np.zeros(h) for _ in range(hdr.n_channels)]
        self._first = True
        return cp

    def ReadDataBlock(self, cp: CodingParams):
        """Returns [H] decoded samples per channel, or None at EOF.

        The priming block (first payload) only seeds the overlap tail.
        """
        h = self.cfg.n_mdct_lines
        while True:
            if self._off >= len(self._buf):
                return None
            out = []
            for c in range(cp.nChannels):
                n = int.from_bytes(self._buf[self._off:self._off + 2],
                                   "little")
                self._off += 2
                payload = self._buf[self._off:self._off + n]
                self._off += n
                y = DecodeSingleChannel(*_read_payload(payload, self.cfg),
                                        self.cfg)
                out.append(self._tail[c] + y[:h])
                self._tail[c] = y[h:]
            if self._first:
                self._first = False
                continue          # discard the priming half
            return out
