"""Per-channel Encode/Decode (oracle, serial). SURVEY.md §2 #4, SPEC.md §4–§6.

Oracle counterpart of the reference's ``codec.py``. Every step is the
serial form of the corresponding tac stage (tac/codec.py encode_frame /
decode_frame); decisions must agree integer-for-integer per SPEC.md §10.
"""

from __future__ import annotations

import numpy as np

from tac import bands
from tac.config import CodecConfig
from tac.oracle import bitalloc as ba
from tac.oracle import psychoac as psy
from tac.oracle import quantize as qz
from tac.oracle.mdct import IMDCT, MDCT
from tac.oracle.window import get_window


def mantissa_budget(cfg: CodecConfig, h: int) -> int:
    """SPEC.md §6 per-(block, channel) mantissa bit budget."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    b = (cfg.bitrate_bps * h) // (cfg.sample_rate * cfg.n_channels) \
        - s - bands.N_BANDS * (s + a) - (2 if cfg.use_block_switch else 0) \
        - (2 if cfg.use_huffman else 0)
    return max(int(b), 0)


def _analyze(fullBlock: np.ndarray, cfg: CodecConfig):
    """Window + MDCT + SMR of one [N] block → (X[H], smr[B] pre-snap)."""
    h = cfg.n_mdct_lines
    w = get_window(cfg.window, 2 * h, cfg.kbd_alpha)
    X = MDCT(w * fullBlock, h, h)
    bol = bands.band_of_line(cfg.sample_rate, h)
    if cfg.use_psy and cfg.alloc_mode in ("greedy", "const_mnr"):
        smr = psy.CalcSMRs(fullBlock, X, 0, cfg.sample_rate, w)
    elif cfg.alloc_mode == "const_snr":
        spl = psy.SPL(8.0 / np.mean(w ** 2) * X ** 2)
        smr = np.full(bands.N_BANDS, -1e30)
        for k in range(h):
            smr[bol[k]] = max(smr[bol[k]], spl[k])
    else:
        smr = np.zeros(bands.N_BANDS)
    return X, smr


def _smr_snapped(smr: np.ndarray, cfg: CodecConfig) -> np.ndarray:
    return ba.snap_smr(smr) if cfg.alloc_mode != "uniform" \
        else np.zeros(bands.N_BANDS)


def _quantize_with_alloc(X: np.ndarray, alloc: np.ndarray,
                         cfg: CodecConfig):
    """Spectrum + final allocation → (ovs, alloc, scale, mant per band)."""
    h = cfg.n_mdct_lines
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    n_lines = bands.lines_per_band(cfg.sample_rate, h)
    ovs = qz.ScaleFactor(np.max(np.abs(X)), s, a)
    scaled = X * 2.0 ** ovs
    scale = np.zeros(bands.N_BANDS, np.int64)
    mant = []
    lo = 0
    for b in range(bands.N_BANDS):
        nl = int(n_lines[b])
        lines = scaled[lo:lo + nl]
        lo += nl
        if alloc[b] > 0 and nl > 0:
            scale[b] = qz.ScaleFactor(np.max(np.abs(lines)), s, int(alloc[b]))
            mant.append(qz.vMantissa(lines, int(scale[b]), s, int(alloc[b])))
        else:
            mant.append([])
    return ovs, alloc, scale, mant


def EncodeSingleChannel(fullBlock: np.ndarray, cfg: CodecConfig,
                        budget: int | None = None):
    """[N] samples → (ovs, alloc[B], scale[B], mant list per band).

    budget overrides the static per-frame mantissa budget (VBR reservoir,
    SPEC.md §8) — must mirror tac.codec.encode_frame(budget=...).
    """
    h = cfg.n_mdct_lines
    X, smr = _analyze(fullBlock, cfg)
    n_lines = bands.lines_per_band(cfg.sample_rate, h)
    if budget is None:
        budget = mantissa_budget(cfg, h)
    alloc = ba.BitAlloc(budget, cfg.max_mant_bits, bands.N_BANDS, n_lines,
                        _smr_snapped(smr, cfg))
    return _quantize_with_alloc(X, alloc, cfg)


def EncodeBlockMS(full_m: np.ndarray, full_s: np.ndarray, cfg: CodecConfig,
                  budget: int | None = None):
    """Joint M/S encode of one block pair (SPEC.md §11).

    full_m/full_s: [N] mid/side samples (already butterflied). ONE greedy
    BitAlloc over the concatenated 2B bands (mid's bands first — the tac
    joint water-fill's tie-break order) with budget 2× the per-channel
    budget. Returns [(ovs, alloc, scale, mant), ...] per channel; must
    mirror tac.codec._joint_alloc_pairs decision-for-decision."""
    h = cfg.n_mdct_lines
    n_lines = bands.lines_per_band(cfg.sample_rate, h)
    Xm, smr_m = _analyze(full_m, cfg)
    Xs, smr_s = _analyze(full_s, cfg)
    if budget is None:
        budget = 2 * mantissa_budget(cfg, h)
    smr2 = np.concatenate([_smr_snapped(smr_m, cfg),
                           _smr_snapped(smr_s, cfg)])
    nl2 = np.concatenate([n_lines, n_lines])
    alloc2 = ba.BitAlloc(budget, cfg.max_mant_bits, 2 * bands.N_BANDS,
                         nl2, smr2)
    return [_quantize_with_alloc(Xm, alloc2[:bands.N_BANDS], cfg),
            _quantize_with_alloc(Xs, alloc2[bands.N_BANDS:], cfg)]


def DecodeSingleChannel(ovs: int, alloc, scale, mant, cfg: CodecConfig
                        ) -> np.ndarray:
    """Quantized tuple → [N] windowed time block (pre-overlap-add)."""
    h = cfg.n_mdct_lines
    s = cfg.n_scale_bits
    w = get_window(cfg.window, 2 * h, cfg.kbd_alpha)
    n_lines = bands.lines_per_band(cfg.sample_rate, h)
    scaled = np.zeros(h)
    lo = 0
    for b in range(bands.N_BANDS):
        nl = int(n_lines[b])
        if alloc[b] > 0 and nl > 0:
            scaled[lo:lo + nl] = qz.vDequantizeMantissa(
                mant[b], int(scale[b]), s, int(alloc[b]))
        lo += nl
    X = scaled * 2.0 ** (-ovs)
    return w * IMDCT(X, h, h)
