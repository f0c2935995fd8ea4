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
    """SPEC.md §9: same per-frame budget for every window state (the 2-bit
    tableId also comes out of the budget in the huffman combo, §8)."""
    h = cfg.n_mdct_lines
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    b = (cfg.bitrate_bps * h) // (cfg.sample_rate * cfg.n_channels) \
        - 2 - s - bands.N_BANDS * (s + a) \
        - (2 if cfg.use_huffman else 0)
    return max(b, 0)


def _quantize_grouped(lines: np.ndarray, alloc: np.ndarray,
                      bol: np.ndarray, n_lines: np.ndarray,
                      cfg: CodecConfig):
    """Quantize a (possibly non-contiguous-band) line vector at a given
    allocation — the serialization half of _encode_grouped."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    ovs = qz.ScaleFactor(np.max(np.abs(lines)), s, a)
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


def _encode_grouped(lines: np.ndarray, smr: np.ndarray, bol: np.ndarray,
                    n_lines: np.ndarray, cfg: CodecConfig, budget: int):
    """Serial decision chain on a (possibly non-contiguous-band) line
    vector — mirror of tac.codec.quantize_lines."""
    alloc = ba.BitAlloc(budget, cfg.max_mant_bits, bands.N_BANDS, n_lines,
                        smr)
    return _quantize_grouped(lines, alloc, bol, n_lines, cfg)


def _psy_smr(full: np.ndarray, lines: np.ndarray, gain: float, fs: int,
             bol: np.ndarray) -> np.ndarray:
    thr = psy.SPL(psy.getMaskedThreshold(full, fs))
    line_spl = psy.SPL(gain * lines ** 2)
    smr = np.full(bands.N_BANDS, -1e30)
    for kk in range(len(lines)):
        smr[bol[kk]] = max(smr[bol[kk]], line_spl[kk] - thr[kk])
    return smr


def _write_grouped(pb: PackedBits, ovs, alloc, scale, mant,
                   bol: np.ndarray, cfg: CodecConfig,
                   table_id: int | None = None) -> None:
    """table_id: None in plain block-switch mode; 0/1 in the huffman combo
    (SPEC.md §7 order: ovs | 2-bit tableId | allocs | sfs | mantissas)."""
    from tac import huffman as hf

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    pb.WriteBits(int(ovs), s)
    if table_id is not None:
        pb.WriteBits(int(table_id), 2)
    for b in range(bands.N_BANDS):
        pb.WriteBits(int(alloc[b]) - 1 if alloc[b] > 0 else 0, a)
    for b in range(bands.N_BANDS):
        if alloc[b] > 0:
            pb.WriteBits(int(scale[b]), s)
    tabs = hf.load_tables(table_id) if table_id in hf.SET_PATHS and table_id <= hf.n_sets() else None
    for i in range(len(mant)):
        m = int(alloc[bol[i]])
        if m <= 0:
            continue
        q = int(mant[i])
        if table_id in hf.SET_PATHS and table_id <= hf.n_sets() and hf.MIN_M <= m <= hf.MAX_M:
            t = tabs[m]
            if t["lengths"][q] > 0:
                pb.WriteBits(int(t["codes"][q]), int(t["lengths"][q]))
            else:                             # escape + raw m bits
                pb.WriteBits(int(t["codes"][-1]), int(t["lengths"][-1]))
                pb.WriteBits(q, m)
        else:
            pb.WriteBits(q, m)


def _grouped_costs(alloc, mant, bol: np.ndarray, n_sets: int = 2
                   ) -> tuple[int, list[int]]:
    """(raw_bits, [huffman_bits per trained set]) of a grouped mantissa
    vector (SPEC.md §8)."""
    from tac import huffman as hf

    costs = [hf.cost_table_np(sid) for sid in range(1, n_sets + 1)]
    raw = 0
    hufs = [0] * len(costs)
    for i in range(len(mant)):
        m = int(alloc[bol[i]])
        if m <= 0:
            continue
        raw += m
        if hf.MIN_M <= m <= hf.MAX_M:
            for si, cost in enumerate(costs):
                hufs[si] += int(cost[m - hf.MIN_M, int(mant[i])])
        else:
            for si in range(len(costs)):
                hufs[si] += m
    return raw, hufs


def _read_grouped(pb: PackedBits, bol: np.ndarray, cfg: CodecConfig,
                  n: int):
    from tac import huffman as hf
    from tac.oracle.pacfile import _read_huffman_symbol

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
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
    mant = np.zeros(n, np.int64)
    for i in range(n):
        m = int(alloc[bol[i]])
        if m <= 0:
            continue
        if table_id in hf.SET_PATHS and table_id <= hf.n_sets() and hf.MIN_M <= m <= hf.MAX_M:
            mant[i] = _read_huffman_symbol(pb, m, tabs)
        else:
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


def _analyze_block_bs(full: np.ndarray, state: int, cfg: CodecConfig):
    """One [N] block at the given window state → (lines, snapped smr,
    bol, n_lines) — the state-selected analysis half (budget-free)."""
    h, hs = cfg.n_mdct_lines, cfg.n_mdct_lines_short
    fs = cfg.sample_rate
    k, h3 = h // hs, (h - hs) // 2
    bol_l, nl_l, bol_g, nl_g = _tables(cfg)
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
        return lines, smr, bol_l, nl_l
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
    return lines, smr, bol_g, nl_g


def _encode_block_bs_fields(full: np.ndarray, state: int, cfg: CodecConfig,
                            budget: int):
    """One [N] block at the given window state → ((ovs, alloc, scale,
    mant), bol) — the state-selected decision chain, serialization apart."""
    lines, smr, bol, nl = _analyze_block_bs(full, state, cfg)
    return _encode_grouped(lines, smr, bol, nl, cfg, budget), bol


def encode_block_bs_ms(full_m: np.ndarray, full_s: np.ndarray, state: int,
                       cfg: CodecConfig, budget: int):
    """Joint M/S block encode at a SHARED window state (SPEC.md §11 × §9).

    ONE BitAlloc over the pair's concatenated 2B state-selected bands
    (mid's bands first — the tac joint water-fill's tie-break order)
    sharing `budget` (the caller passes 2× the per-channel budget, plus
    the joint reservoir in the huffman combo). Returns
    ([(ovs, alloc, scale, mant), ...] per channel, bol) — mirrors
    tac.blockswitch._encode_ms_bs_rows_chunk decision-for-decision."""
    lm, sm, bol, nl = _analyze_block_bs(full_m, state, cfg)
    ls_, ss, _, _ = _analyze_block_bs(full_s, state, cfg)
    smr2 = np.concatenate([sm, ss])
    nl2 = np.concatenate([nl, nl])
    alloc2 = ba.BitAlloc(budget, cfg.max_mant_bits, 2 * bands.N_BANDS,
                         nl2, smr2)
    return ([_quantize_grouped(lm, alloc2[:bands.N_BANDS], bol, nl, cfg),
             _quantize_grouped(ls_, alloc2[bands.N_BANDS:], bol, nl, cfg)],
            bol)


def encode_block_bs(full: np.ndarray, state: int, cfg: CodecConfig,
                    pb: PackedBits) -> None:
    """Encode one [N] block at the given window state into pb."""
    res, bol = _encode_block_bs_fields(full, state, cfg, frame_budget(cfg))
    pb.WriteBits(int(state), 2)
    _write_grouped(pb, *res, bol, cfg)


def encode_block_bs_vbr(full: np.ndarray, state: int, cfg: CodecConfig,
                        budget: int) -> tuple[bytes, int]:
    """Huffman-combo block encode (SPEC.md §8+§9): encode at the reservoir
    budget, price the state-selected mantissas raw vs Huffman, emit
    [state | ovs | tableId | ...]. Returns (payload bytes, used bits)."""
    from tac.oracle.pacfile import pick_tid

    res, bol = _encode_block_bs_fields(full, state, cfg, budget)
    ovs, alloc, scale, mant = res
    raw, hufs = _grouped_costs(alloc, mant, bol, cfg.huffman_sets)
    tid, used = pick_tid(raw, hufs)
    pb = PackedBits()
    pb.WriteBits(int(state), 2)
    _write_grouped(pb, ovs, alloc, scale, mant, bol, cfg, table_id=tid)
    return pb.GetPackedData(), used


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
