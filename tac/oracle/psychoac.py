"""Psychoacoustic model (oracle, serial). SPEC.md §5.

Oracle counterpart of the reference's ``psychoac.py`` (SURVEY.md §2 #9).
Deliberately keeps the reference's per-masker Python loop (SURVEY.md §3.3
hot loop) — the TPU rebuild replaces it with a dense [maskers x lines]
broadcast in one XLA graph (tac/psy.py).
"""

from __future__ import annotations

import numpy as np

from tac import bands
from tac.oracle.window import hann_window

MAX_MASKERS = 64
DELTA_TONAL = 16.0
DELTA_NOISE = 6.0


def SPL(intensity):
    return np.maximum(96.0 + 10.0 * np.log10(np.maximum(intensity, 1e-40)),
                      -30.0)


def Intensity(spl):
    return 10.0 ** ((spl - 96.0) / 10.0)


def Thresh(f):
    fk = np.maximum(f, 20.0) / 1000.0
    return (3.64 * fk ** -0.8 - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
            + 1e-3 * fk ** 4)


def Bark(f):
    return 13.0 * np.arctan(0.76 * f / 1000.0) \
        + 3.5 * np.arctan((f / 7500.0) ** 2)


class Masker:
    """One masker: frequency, SPL, tonal/noise drop. SPEC.md §5 spreading."""

    def __init__(self, f: float, spl: float, isTonal: bool = True):
        self.f = f
        self.z = Bark(f)
        self.spl = spl
        self.drop = DELTA_TONAL if isTonal else DELTA_NOISE

    def vIntensityAtBark(self, zVec: np.ndarray) -> np.ndarray:
        dz = zVec - self.z
        up = max(27.0 - 0.367 * max(self.spl - 40.0, 0.0), 0.0)
        spread = np.where(dz < 0, 27.0 * dz, -up * dz)
        return Intensity(self.spl - self.drop + spread)


def getMaskedThreshold(data: np.ndarray, fs: float) -> np.ndarray:
    """Masked-threshold intensity at the H = N/2 line frequencies."""
    n = len(data)
    h = n // 2
    w = hann_window(n)
    xf = np.fft.fft(data * w)[:h]
    gain = 4.0 / (n * n * np.mean(w ** 2))
    ii = gain * np.abs(xf) ** 2
    freqs = (np.arange(h) + 0.5) * fs / n

    # tonal maskers: interior local maxima, +-1 bin intensity aggregation
    peaks = []                              # (aggregated intensity, p)
    for p in range(1, h - 1):
        if ii[p] > ii[p - 1] and ii[p] >= ii[p + 1]:
            peaks.append((ii[p - 1] + ii[p] + ii[p + 1], p))
    peaks.sort(key=lambda t: (-t[0], t[1]))
    peaks = [t for t in peaks if t[0] > 0.0][:MAX_MASKERS]

    maskers = []
    kept_bins = set()
    for agg, p in peaks:
        fm = (ii[p - 1] * freqs[p - 1] + ii[p] * freqs[p]
              + ii[p + 1] * freqs[p + 1]) / agg
        maskers.append(Masker(fm, SPL(agg), isTonal=True))
        kept_bins.update((p - 1, p, p + 1))

    # noise maskers: per band, sum of non-kept-bin intensity
    bol = bands.band_of_line(int(fs), h)
    centers = bands.band_center_freqs(int(fs))
    for b in range(bands.N_BANDS):
        noise_i = sum(ii[p] for p in range(h)
                      if bol[p] == b and p not in kept_bins)
        if noise_i > 0.0:
            maskers.append(Masker(centers[b], SPL(noise_i), isTonal=False))

    z = Bark(freqs)
    thr = Intensity(Thresh(freqs))
    for m in maskers:                       # reference-style per-masker loop
        thr = thr + m.vIntensityAtBark(z)
    return thr


def CalcSMRs(data: np.ndarray, MDCTdata: np.ndarray, MDCTscale: int,
             fs: float, window: np.ndarray) -> np.ndarray:
    """SMR per scale-factor band; MDCTdata are pre-rescale lines. SPEC.md §5."""
    h = len(MDCTdata)
    thr_spl = SPL(getMaskedThreshold(data, fs))
    gain = 8.0 / np.mean(window ** 2)
    line_spl = SPL(gain * (MDCTdata * 2.0 ** (-MDCTscale)) ** 2)
    smr_line = line_spl - thr_spl
    bol = bands.band_of_line(int(fs), h)
    smr = np.full(bands.N_BANDS, -1e30)
    for k in range(h):
        b = bol[k]
        if smr_line[k] > smr[b]:
            smr[b] = smr_line[k]
    return smr
