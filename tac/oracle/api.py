"""Oracle end-to-end driver (serial block loop). SURVEY.md §2 #13, §3.1–§3.2.

The reference's __main__ encode/decode loop, as functions. This is the
measured baseline path for BASELINE.md ("reference encode speed"):
single-threaded Python/NumPy, per-block, bit-by-bit.
"""

from __future__ import annotations

import numpy as np

from tac.config import CodecConfig
from tac.oracle.audiofile import CodingParams
from tac.oracle.pacfile import PACFile
from tac.oracle.wavfile import WAVFile


def _ms_fwd_np(x: np.ndarray) -> np.ndarray:
    """[T, C] L/R → M/S per adjacent channel pair (SPEC.md §11)."""
    y = np.empty_like(x)
    y[:, 0::2] = 0.5 * (x[:, 0::2] + x[:, 1::2])
    y[:, 1::2] = 0.5 * (x[:, 0::2] - x[:, 1::2])
    return y


def _ms_inv_np(x: np.ndarray) -> np.ndarray:
    """[T, C] M/S → L/R per adjacent channel pair."""
    y = np.empty_like(x)
    y[:, 0::2] = x[:, 0::2] + x[:, 1::2]
    y[:, 1::2] = x[:, 0::2] - x[:, 1::2]
    return y


def encode(wav_path: str, pac_path: str, cfg: CodecConfig) -> None:
    wav = WAVFile(wav_path)
    cp = wav.OpenForReading()
    cfg = cfg.replace(sample_rate=cp.sampleRate, n_channels=cp.nChannels)
    cp.nSamplesPerBlock = cfg.n_mdct_lines
    pac = PACFile(pac_path, cfg)
    pac.OpenForWriting(cp)
    while True:
        data = wav.ReadDataBlock(cp)
        if data is None:
            break
        if cfg.stereo_mode == "ms":      # per-block butterfly == whole-signal
            data = list(_ms_fwd_np(
                np.stack([np.asarray(d) for d in data], axis=1)).T)
        pac.WriteDataBlock(data, cp)
    pac.Close(cp)
    wav.Close(cp)


def decode(pac_path: str, wav_path: str,
           cfg: CodecConfig | None = None) -> None:
    pac = PACFile(pac_path, cfg or CodecConfig())
    cp = pac.OpenForReading()
    out = WAVFile(wav_path)
    out.OpenForWriting(cp)
    while True:
        data = pac.ReadDataBlock(cp)
        if data is None:
            break
        if pac.cfg.stereo_mode == "ms":
            data = list(_ms_inv_np(
                np.stack([np.asarray(d) for d in data], axis=1)).T)
        out.WriteDataBlock(data, cp)
    out.Close(cp)
    pac.Close(cp)


# Array-level equivalents (for tests/bench; same serial block loop).

def encode_array(x: np.ndarray, cfg: CodecConfig) -> bytes:
    """x: float[T] or [T, C] → PAC-T bytes (byte-compatible with tac.api)."""
    import io

    x = np.asarray(x, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    t, c = x.shape
    cfg = cfg.replace(n_channels=c)
    if cfg.stereo_mode == "ms":
        # pairwise butterfly whole-signal (SPEC.md §11) — blocks see M/S
        x = _ms_fwd_np(x)
    h = cfg.n_mdct_lines
    cp = CodingParams(sampleRate=cfg.sample_rate, nChannels=c, numSamples=t,
                      nSamplesPerBlock=h)
    pac = PACFile("<mem>", cfg)
    pac.fp = io.BytesIO()
    pac.WriteFileHeader(cp)
    n_blocks = -(-t // h)
    xp = np.concatenate([x, np.zeros((n_blocks * h - t, c))])

    if cfg.use_block_switch and cfg.stereo_mode == "ms":
        # SPEC.md §11 × §9: x is already M/S; a transient in EITHER
        # channel of a pair switches BOTH (shared per-pair window state),
        # the allocation is joint over 2B state-selected bands, and the
        # huffman combo runs ONE joint reservoir + tableId per pair.
        from tac.oracle import blockswitch as obs
        from tac.oracle.bitpack import PackedBits
        f = n_blocks + 1
        n_pairs = c // 2
        states = [obs.window_states(
            obs.transient_flags(x[:, 2 * p], cfg)
            | obs.transient_flags(x[:, 2 * p + 1], cfg), f)
            for p in range(n_pairs)]
        prior = [np.zeros(h) for _ in range(c)]
        base2 = 2 * obs.frame_budget(cfg)
        cap2 = cfg.reservoir_factor * base2
        res = [0] * n_pairs
        for i in range(f):
            newb = xp[i * h:(i + 1) * h] if i < n_blocks \
                else np.zeros((h, c))
            fulls = []
            for ch in range(c):
                fulls.append(np.concatenate([prior[ch], newb[:, ch]]))
                prior[ch] = newb[:, ch].copy()
            for p in range(n_pairs):
                st = int(states[p][i])
                if cfg.use_huffman:
                    from tac.oracle.pacfile import pick_tid
                    tuples, bol = obs.encode_block_bs_ms(
                        fulls[2 * p], fulls[2 * p + 1], st, cfg,
                        base2 + res[p])
                    raw = 0
                    hufs = [0] * cfg.huffman_sets
                    for _, alloc, _, mant in tuples:
                        r_, h_ = obs._grouped_costs(alloc, mant, bol,
                                                    cfg.huffman_sets)
                        raw += r_
                        hufs = [x + y for x, y in zip(hufs, h_)]
                    tid, used = pick_tid(raw, hufs)
                    res[p] = min(max(res[p] + base2 - used, 0), cap2)
                else:
                    tuples, bol = obs.encode_block_bs_ms(
                        fulls[2 * p], fulls[2 * p + 1], st, cfg, base2)
                    tid = None
                for t4 in tuples:
                    pb = PackedBits()
                    pb.WriteBits(st, 2)
                    obs._write_grouped(pb, *t4, bol, cfg, table_id=tid)
                    payload = pb.GetPackedData()
                    pac.fp.write(len(payload).to_bytes(2, "little"))
                    pac.fp.write(payload)
    elif cfg.use_block_switch:
        from tac.oracle import blockswitch as obs
        from tac.oracle.bitpack import PackedBits
        f = n_blocks + 1
        states = [obs.window_states(obs.transient_flags(x[:, ch], cfg), f)
                  for ch in range(c)]
        prior = [np.zeros(h) for _ in range(c)]
        base = obs.frame_budget(cfg)
        cap = cfg.reservoir_factor * base
        res = [0] * c                      # VBR bit reservoir (SPEC.md §8)
        for i in range(f):
            newb = xp[i * h:(i + 1) * h] if i < n_blocks \
                else np.zeros((h, c))
            for ch in range(c):
                full = np.concatenate([prior[ch], newb[:, ch]])
                prior[ch] = newb[:, ch].copy()
                if cfg.use_huffman:
                    payload, used = obs.encode_block_bs_vbr(
                        full, int(states[ch][i]), cfg, base + res[ch])
                    res[ch] = min(max(res[ch] + base - used, 0), cap)
                else:
                    pb = PackedBits()
                    obs.encode_block_bs(full, int(states[ch][i]), cfg, pb)
                    payload = pb.GetPackedData()
                pac.fp.write(len(payload).to_bytes(2, "little"))
                pac.fp.write(payload)
    else:
        for i in range(n_blocks):
            pac.WriteDataBlock([xp[i * h:(i + 1) * h, ch]
                                for ch in range(c)], cp)
        pac.WriteDataBlock([np.zeros(h)] * c, cp)    # flush tail
    data = pac.fp.getvalue()
    pac.fp.close()
    del pac._prior                                   # Close must not re-flush
    return data


def decode_array(data: bytes, cfg: CodecConfig | None = None
                 ) -> tuple[np.ndarray, int]:
    """PAC-T bytes → (float64[T, C], sample_rate)."""
    import io

    pac = PACFile("<mem>", cfg or CodecConfig())
    pac.fp = io.BytesIO(data)
    cp = pac.ReadFileHeader()
    if pac.cfg.use_block_switch:
        from tac.oracle import blockswitch as obs
        from tac.oracle.bitpack import PackedBits
        h = pac.cfg.n_mdct_lines
        tails = [np.zeros(h) for _ in range(cp.nChannels)]
        chunks = []
        first = True
        while pac._off < len(pac._buf):
            outs = []
            for ch in range(cp.nChannels):
                n = int.from_bytes(pac._buf[pac._off:pac._off + 2],
                                   "little")
                pac._off += 2
                pb = PackedBits()
                pb.SetPackedData(pac._buf[pac._off:pac._off + n])
                pac._off += n
                y = obs.decode_block_bs(pb, pac.cfg)
                outs.append(tails[ch] + y[:h])
                tails[ch] = y[h:]
            if first:
                first = False
                continue
            chunks.append(np.stack(outs, axis=1))
    else:
        chunks = []
        while True:
            out = pac.ReadDataBlock(cp)
            if out is None:
                break
            chunks.append(np.stack(out, axis=1))
    x = np.concatenate(chunks, axis=0)[:cp.numSamples]
    if pac.cfg.stereo_mode == "ms":
        x = _ms_inv_np(x)
    return x, cp.sampleRate
