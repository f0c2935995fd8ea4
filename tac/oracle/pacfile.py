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


def _write_fields(pb: PackedBits, ovs, alloc, scale, mant,
                  cfg: CodecConfig, h: int) -> None:
    """Raw field layout at block size h: ovs | allocs | sfs | mantissas."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
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


def _read_fields(pb: PackedBits, cfg: CodecConfig, h: int):
    """Inverse of _write_fields → (ovs, alloc, scale, mant-per-band)."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    n_lines = bands.lines_per_band(cfg.sample_rate, h)
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


def _write_payload(ovs, alloc, scale, mant, cfg: CodecConfig,
                   table_id: int | None = None) -> bytes:
    """One channel's payload per SPEC.md §7 (table_id set in huffman mode)."""
    from tac import huffman as hf

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    pb = PackedBits()
    pb.WriteBits(int(ovs), s)
    if table_id is not None:
        pb.WriteBits(int(table_id), 2)
    for b in range(bands.N_BANDS):
        code = int(alloc[b]) - 1 if alloc[b] > 0 else 0
        pb.WriteBits(code, a)
    for b in range(bands.N_BANDS):
        if alloc[b] > 0:
            pb.WriteBits(int(scale[b]), s)
    if table_id in hf.SET_PATHS and table_id <= hf.n_sets():
        tabs = hf.load_tables(table_id)
        for b in range(bands.N_BANDS):
            m = int(alloc[b])
            for q in mant[b]:
                q = int(q)
                if hf.MIN_M <= m <= hf.MAX_M:
                    t = tabs[m]
                    if t["lengths"][q] > 0:
                        pb.WriteBits(int(t["codes"][q]),
                                     int(t["lengths"][q]))
                    else:                     # escape + raw m bits
                        pb.WriteBits(int(t["codes"][-1]),
                                     int(t["lengths"][-1]))
                        pb.WriteBits(q, m)
                else:
                    pb.WriteBits(q, m)
    else:
        for b in range(bands.N_BANDS):
            for m in mant[b]:
                pb.WriteBits(int(m), int(alloc[b]))
    return pb.GetPackedData()


def _mantissa_costs(alloc, mant, cfg: CodecConfig
                    ) -> tuple[int, list[int]]:
    """(raw_bits, [huffman_bits per trained set]) for one channel's
    mantissas (SPEC.md §8; set count = cfg.huffman_sets)."""
    from tac import huffman as hf

    costs = [hf.cost_table_np(sid)
             for sid in range(1, cfg.huffman_sets + 1)]
    raw = 0
    hufs = [0] * len(costs)
    for b in range(bands.N_BANDS):
        m = int(alloc[b])
        for q in mant[b]:
            raw += m
            if hf.MIN_M <= m <= hf.MAX_M:
                for si, cost in enumerate(costs):
                    hufs[si] += int(cost[m - hf.MIN_M, int(q)])
            else:
                for si in range(len(costs)):
                    hufs[si] += m
    return raw, hufs


def pick_tid(raw: int, hufs: list[int]) -> tuple[int, int]:
    """(tableId, used_bits) from the (1 + n_sets)-way min with tie order
    raw <= set1 <= set2 <= set3 (SPEC.md §8) — the serial mirror of
    codec._reservoir_chain's argmin."""
    best, tid = raw, 0
    for si, h in enumerate(hufs):
        if h < best:
            best, tid = h, si + 1
    return tid, best


def _read_huffman_symbol(pb: PackedBits, m: int, tabs) -> int:
    """Canonical-code walk: extend bit by bit until a (len, code) matches."""
    t = tabs[m]
    by_len: dict[int, dict[int, int]] = {}
    for sym, (l, c) in enumerate(zip(t["lengths"], t["codes"])):
        if l > 0:
            by_len.setdefault(int(l), {})[int(c)] = sym
    code = 0
    for l in range(1, max(by_len) + 1):
        code = (code << 1) | pb.ReadBits(1)
        sym = by_len.get(l, {}).get(code)
        if sym is not None:
            if sym == 2 ** m:                 # ESCAPE → raw m bits follow
                return pb.ReadBits(m)
            return sym
    raise ValueError("invalid Huffman stream")


def _read_payload(data: bytes, cfg: CodecConfig):
    from tac import huffman as hf

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    n_lines = bands.lines_per_band(cfg.sample_rate, cfg.n_mdct_lines)
    pb = PackedBits()
    pb.SetPackedData(data)
    ovs = pb.ReadBits(s)
    table_id = pb.ReadBits(2) if cfg.use_huffman else 0
    alloc = np.zeros(bands.N_BANDS, np.int64)
    for b in range(bands.N_BANDS):
        c = pb.ReadBits(a)
        alloc[b] = c + 1 if c > 0 else 0
    scale = np.zeros(bands.N_BANDS, np.int64)
    for b in range(bands.N_BANDS):
        if alloc[b] > 0:
            scale[b] = pb.ReadBits(s)
    tabs = hf.load_tables(table_id) if table_id in hf.SET_PATHS and table_id <= hf.n_sets() else None
    mant = []
    for b in range(bands.N_BANDS):
        m = int(alloc[b])
        if m <= 0:
            mant.append([])
        elif table_id in hf.SET_PATHS and table_id <= hf.n_sets() and hf.MIN_M <= m <= hf.MAX_M:
            mant.append([_read_huffman_symbol(pb, m, tabs)
                         for _ in range(int(n_lines[b]))])
        else:
            mant.append([pb.ReadBits(m) for _ in range(int(n_lines[b]))])
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
            n_lines_short=(bands.lines_per_band(cp.sampleRate,
                                                cfg.n_mdct_lines_short)
                           if cfg.use_block_switch else None),
            huffman=cfg.use_huffman, blockswitch=cfg.use_block_switch,
            ms=cfg.stereo_mode == "ms")
        self.fp.write(bs.write_header(hdr))
        self._prior = [np.zeros(h) for _ in range(cp.nChannels)]
        self._res = [0] * cp.nChannels       # VBR bit reservoir (SPEC.md §8)
        # (ms mode uses one JOINT reservoir — kept in self._res[0])

    def WriteDataBlock(self, data, cp: CodingParams) -> None:
        """data: list of [H] new samples per channel (the reference's serial
        overlap contract, SURVEY.md §3.1). In ms mode `data` must already
        be mid/side (the array/file drivers butterfly whole-signal)."""
        from tac.oracle.codec import mantissa_budget

        cfg = self.cfg
        base = mantissa_budget(cfg, cfg.n_mdct_lines)
        cap = cfg.reservoir_factor * base
        if cfg.stereo_mode == "ms":
            self._write_block_ms(data, base)
            return
        for c in range(cp.nChannels):
            full = np.concatenate([self._prior[c], data[c]])
            self._prior[c] = np.asarray(data[c], np.float64).copy()
            if cfg.use_huffman:
                budget = base + self._res[c]
                ovs, alloc, scale, mant = EncodeSingleChannel(full, cfg,
                                                              budget)
                raw, hufs = _mantissa_costs(alloc, mant, cfg)
                tid, used = pick_tid(raw, hufs)
                self._res[c] = min(max(self._res[c] + base - used, 0), cap)
                payload = _write_payload(ovs, alloc, scale, mant, cfg,
                                         table_id=tid)
            else:
                payload = _write_payload(*EncodeSingleChannel(full, cfg),
                                         cfg)
            self.fp.write(len(payload).to_bytes(2, "little"))
            self.fp.write(payload)

    def _write_block_ms(self, data, base: int) -> None:
        """Joint M/S block write (SPEC.md §11): one BitAlloc over each
        channel PAIR's 2B bands; huffman mode uses one JOINT reservoir
        (self._res[p]) and one tableId written into both of the pair's
        payloads. Channels butterfly pairwise (2p, 2p+1) — stereo is the
        one-pair case."""
        from tac.oracle.codec import EncodeBlockMS

        cfg = self.cfg
        fulls = []
        for c in range(len(data)):
            fulls.append(np.concatenate([self._prior[c], data[c]]))
            self._prior[c] = np.asarray(data[c], np.float64).copy()
        payloads = []
        for p in range(len(data) // 2):
            if cfg.use_huffman:
                base2 = 2 * base
                cap2 = cfg.reservoir_factor * base2
                budget = base2 + self._res[p]
                tuples = EncodeBlockMS(fulls[2 * p], fulls[2 * p + 1],
                                       cfg, budget)
                raw = 0
                hufs = [0] * cfg.huffman_sets
                for ovs, alloc, scale, mant in tuples:
                    r_, h_ = _mantissa_costs(alloc, mant, cfg)
                    raw += r_
                    hufs = [x + y for x, y in zip(hufs, h_)]
                tid, used = pick_tid(raw, hufs)
                self._res[p] = min(max(self._res[p] + base2 - used, 0),
                                   cap2)
                payloads += [_write_payload(*t, cfg, table_id=tid)
                             for t in tuples]
            else:
                tuples = EncodeBlockMS(fulls[2 * p], fulls[2 * p + 1], cfg)
                payloads += [_write_payload(*t, cfg) for t in tuples]
        for payload in payloads:
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
            n_mant_size_bits=hdr.n_mant_size_bits,
            use_huffman=hdr.huffman, use_block_switch=hdr.blockswitch,
            stereo_mode="ms" if hdr.ms else "lr",
            n_mdct_lines_short=max(hdr.n_mdct_lines_short, 1))
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
