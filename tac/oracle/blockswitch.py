"""Block switching (oracle, serial). SPEC.md §9; SURVEY.md §2 #12.

Serial mirror of tac/blockswitch.py: same transient detector, same state
decision (computed with plain loops), same hybrid windows, same GROUPED
short-frame quantization (shared ovs/alloc/scale factors over the K
sub-blocks, flattened line vector with a tiled band map) — byte parity
required (SPEC.md §10).
"""

from __future__ import annotations

import numpy as np

from tac import bands
from tac.config import CodecConfig
from tac.dsp.window import sine_window, transition_windows, window_fn
from tac.oracle import bitalloc as ba
from tac.oracle import psychoac as psy
from tac.oracle import quantize as qz
from tac.oracle.bitpack import PackedBits
from tac.oracle.mdct import IMDCT, MDCT

LONG, START, SHORT, STOP = 0, 1, 2, 3
EPS = 1e-12


def transient_flags(x: np.ndarray, cfg: CodecConfig) -> np.ndarray:
    h = cfg.n_mdct_lines
    t = len(x)
    kb = max(-(-t // h), 1)
    xp = np.concatenate([x, np.zeros(kb * h - t)])
    flags = np.zeros(kb, bool)
    edges = np.round(np.arange(9) * (h - 1) / 8).astype(int)
    for k in range(kb):
        d2 = np.diff(xp[k * h:(k + 1) * h]) ** 2
        e = np.array([d2[edges[j]:edges[j + 1]].sum() for j in range(8)])
        ratio = e[1:] / np.maximum(e[:-1], EPS)
        flags[k] = (ratio.max() > cfg.transient_ratio) \
            and (e[1:].max() > cfg.transient_energy_min)
    return flags


def window_states(t_flags: np.ndarray, f: int) -> np.ndarray:
    def tf(i):
        return bool(t_flags[i]) if 0 <= i < len(t_flags) else False

    def want(i):
        return (tf(i - 1) or tf(i)) if 0 <= i < f else False

    states = np.zeros(f, np.int32)
    for i in range(f):
        if want(i) or (want(i - 1) and want(i + 1)):
            states[i] = SHORT
        elif want(i + 1):
            states[i] = START
        elif want(i - 1):
            states[i] = STOP
        else:
            states[i] = LONG
    return states


def frame_budget(cfg: CodecConfig) -> int:
    """SPEC.md §9: same per-frame budget for every window state."""
    h = cfg.n_mdct_lines
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    b = (cfg.bitrate_bps * h) // (cfg.sample_rate * cfg.n_channels) \
        - 2 - s - bands.N_BANDS * (s + a)
    return max(b, 0)


def _encode_grouped(lines: np.ndarray, smr: np.ndarray, bol: np.ndarray,
                    n_lines: np.ndarray, cfg: CodecConfig, budget: int):
    """Serial decision chain on a (possibly non-contiguous-band) line
    vector — mirror of tac.codec.quantize_lines."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    ovs = qz.ScaleFactor(np.max(np.abs(lines)), s, a)
    alloc = ba.BitAlloc(budget, cfg.max_mant_bits, bands.N_BANDS, n_lines,
                        smr)
    scaled = lines * 2.0 ** ovs
    scale = np.zeros(bands.N_BANDS, np.int64)
    mant = np.zeros(len(lines), np.int64)
    for b in range(bands.N_BANDS):
        if alloc[b] <= 0 or n_lines[b] <= 0:
            continue
        idx = np.nonzero(bol == b)[0]
        scale[b] = qz.ScaleFactor(np.max(np.abs(scaled[idx])), s,
                                  int(alloc[b]))
        for i in idx:
            mant[i] = qz.Mantissa(scaled[i], int(scale[b]), s, int(alloc[b]))
    return ovs, alloc, scale, mant


def _psy_smr(full: np.ndarray, lines: np.ndarray, gain: float, fs: int,
             bol: np.ndarray) -> np.ndarray:
    thr = psy.SPL(psy.getMaskedThreshold(full, fs))
    line_spl = psy.SPL(gain * lines ** 2)
    smr = np.full(bands.N_BANDS, -1e30)
    for kk in range(len(lines)):
        smr[bol[kk]] = max(smr[bol[kk]], line_spl[kk] - thr[kk])
    return smr


def _write_grouped(pb: PackedBits, ovs, alloc, scale, mant,
                   bol: np.ndarray, cfg: CodecConfig) -> None:
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    pb.WriteBits(int(ovs), s)
    for b in range(bands.N_BANDS):
        pb.WriteBits(int(alloc[b]) - 1 if alloc[b] > 0 else 0, a)
    for b in range(bands.N_BANDS):
        if alloc[b] > 0:
            pb.WriteBits(int(scale[b]), s)
    for i in range(len(mant)):
        m = int(alloc[bol[i]])
        if m > 0:
            pb.WriteBits(int(mant[i]), m)


def _read_grouped(pb: PackedBits, bol: np.ndarray, cfg: CodecConfig,
                  n: int):
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    ovs = pb.ReadBits(s)
    alloc = np.zeros(bands.N_BANDS, np.int64)
    for b in range(bands.N_BANDS):
        c = pb.ReadBits(a)
        alloc[b] = c + 1 if c > 0 else 0
    scale = np.zeros(bands.N_BANDS, np.int64)
    for b in range(bands.N_BANDS):
        if alloc[b] > 0:
            scale[b] = pb.ReadBits(s)
    mant = np.zeros(n, np.int64)
    for i in range(n):
        m = int(alloc[bol[i]])
        if m > 0:
            mant[i] = pb.ReadBits(m)
    return ovs, alloc, scale, mant


def _tables(cfg: CodecConfig):
    h, hs, fs = cfg.n_mdct_lines, cfg.n_mdct_lines_short, cfg.sample_rate
    k = h // hs
    bol_l = bands.band_of_line(fs, h)
    nl_l = bands.lines_per_band(fs, h)
    bol_g = np.tile(bands.band_of_line(fs, hs), k)
    nl_g = k * bands.lines_per_band(fs, hs)
    return bol_l, nl_l, bol_g, nl_g


def encode_block_bs(full: np.ndarray, state: int, cfg: CodecConfig,
                    pb: PackedBits) -> None:
    """Encode one [N] block at the given window state into pb."""
    h, hs = cfg.n_mdct_lines, cfg.n_mdct_lines_short
    fs = cfg.sample_rate
    k, h3 = h // hs, (h - hs) // 2
    budget = frame_budget(cfg)
    bol_l, nl_l, bol_g, nl_g = _tables(cfg)
    pb.WriteBits(int(state), 2)
    if state != SHORT:
        wl = window_fn(cfg.window, 2 * h, cfg.kbd_alpha)
        wstart, wstop = transition_windows(2 * h, 2 * hs, cfg.window,
                                           cfg.kbd_alpha)
        w = {LONG: wl, START: wstart, STOP: wstop}[state]
        lines = MDCT(w * full, h, h)
        if cfg.use_psy:
            smr = ba.snap_smr(_psy_smr(full, lines, 8.0 / np.mean(w ** 2),
                                       fs, bol_l))
        else:
            smr = np.zeros(bands.N_BANDS)
        res = _encode_grouped(lines, smr, bol_l, nl_l, cfg, budget)
        _write_grouped(pb, *res, bol_l, cfg)
    else:
        ws = sine_window(2 * hs)
        gain = 8.0 / np.mean(ws ** 2)
        lines = np.zeros(h)
        smr = np.full(bands.N_BANDS, -1e30)
        for j in range(k):
            sub = full[h3 + j * hs: h3 + j * hs + 2 * hs]
            lj = MDCT(ws * sub, hs, hs)
            lines[j * hs:(j + 1) * hs] = lj
            if cfg.use_psy:
                sj = _psy_smr(sub, lj, gain, fs,
                              bands.band_of_line(fs, hs))
                smr = np.maximum(smr, sj)
        smr = ba.snap_smr(smr) if cfg.use_psy else np.zeros(bands.N_BANDS)
        res = _encode_grouped(lines, smr, bol_g, nl_g, cfg, budget)
        _write_grouped(pb, *res, bol_g, cfg)


def decode_block_bs(pb: PackedBits, cfg: CodecConfig) -> np.ndarray:
    """Read one block from pb → [N] windowed output (pre-overlap-add)."""
    h, hs = cfg.n_mdct_lines, cfg.n_mdct_lines_short
    fs = cfg.sample_rate
    k, h3 = h // hs, (h - hs) // 2
    s = cfg.n_scale_bits
    bol_l, nl_l, bol_g, nl_g = _tables(cfg)
    state = pb.ReadBits(2)
    if state != SHORT:
        wl = window_fn(cfg.window, 2 * h, cfg.kbd_alpha)
        wstart, wstop = transition_windows(2 * h, 2 * hs, cfg.window,
                                           cfg.kbd_alpha)
        w = {LONG: wl, START: wstart, STOP: wstop}[state]
        ovs, alloc, scale, mant = _read_grouped(pb, bol_l, cfg, h)
        lines = _dequant_grouped(ovs, alloc, scale, mant, bol_l, cfg)
        return w * IMDCT(lines, h, h)
    ws = sine_window(2 * hs)
    ovs, alloc, scale, mant = _read_grouped(pb, bol_g, cfg, h)
    lines = _dequant_grouped(ovs, alloc, scale, mant, bol_g, cfg)
    out = np.zeros(2 * h)
    for j in range(k):
        out[h3 + j * hs: h3 + j * hs + 2 * hs] += \
            ws * IMDCT(lines[j * hs:(j + 1) * hs], hs, hs)
    return out


def _dequant_grouped(ovs, alloc, scale, mant, bol, cfg: CodecConfig):
    s = cfg.n_scale_bits
    scaled = np.zeros(len(mant))
    for i in range(len(mant)):
        m = int(alloc[bol[i]])
        if m > 0:
            scaled[i] = qz.DequantizeMantissa(int(mant[i]),
                                              int(scale[bol[i]]), s, m)
    return scaled * 2.0 ** (-ovs)
