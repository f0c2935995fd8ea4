"""Deterministic realistic test material (SURVEY.md §2 #14, §4 item 3).

Synthetic but perceptually structured clips modeled on the classic codec
stress set: castanets (sharp wideband attacks — pre-echo stress), a
speech-like utterance (glottal pulse train through time-varying formant
resonators alternating with unvoiced fricative noise — tonal/noise mix),
and a glockenspiel-like strike (sparse inharmonic partials with long decay
— tonality + dynamic-range stress). Everything is generated from fixed
seeds, so quality floors asserted on this material (tests/test_quality.py)
are reproducible bit-for-bit across rounds.

All generators return float64 mono in [-1, 1) at the requested rate.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sps


def castanets(fs: int = 44100, seconds: float = 1.0,
              seed: int = 0xCA57) -> np.ndarray:
    """Click-train of sharp attacks: ~8 strikes/sec with timing jitter.

    Each strike = wideband noise burst with an exponential decay (~8 ms)
    plus a 2.7 kHz resonance ring (the 'clack'), like castanet recordings'
    spectro-temporal envelope. The attack rise is < 1 ms — the canonical
    pre-echo stressor for a 1024-line filterbank.
    """
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    x = np.zeros(n)
    t0 = int(0.03 * fs)
    while t0 < n - int(0.02 * fs):
        dur = int(0.018 * fs)
        k = np.arange(dur)
        burst = rng.standard_normal(dur) * np.exp(-k / (0.004 * fs))
        ring = 0.6 * np.sin(2 * np.pi * 2700 * k / fs + rng.uniform(0, 6.28))
        ring *= np.exp(-k / (0.006 * fs))
        amp = rng.uniform(0.5, 0.9)
        x[t0:t0 + dur] += amp * (0.7 * burst + ring)
        t0 += int(fs * rng.uniform(0.10, 0.16))
    return 0.95 * x / max(np.max(np.abs(x)), 1e-9)


def speech_like(fs: int = 44100, seconds: float = 1.2,
                seed: int = 0x5BEC) -> np.ndarray:
    """Voiced/unvoiced alternation through time-varying formant filters.

    Voiced segments: an impulse train at a drifting f0 (~110-150 Hz) with a
    -6 dB/oct glottal rolloff, filtered through three slowly-moving formant
    resonators (F1 300-800, F2 900-2200, F3 2400-3000 Hz). Unvoiced
    segments: white noise through a high 'fricative' resonance. Segment
    lengths ~60-180 ms, like syllabic rhythm.
    """
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    x = np.zeros(n)
    pos = 0
    voiced = True
    while pos < n:
        seg = min(int(fs * rng.uniform(0.06, 0.18)), n - pos)
        k = np.arange(seg)
        if voiced:
            f0 = rng.uniform(110, 150) * (1 + 0.02 * np.sin(2 * np.pi * 3 *
                                                            k / fs))
            phase = np.cumsum(f0) / fs
            src = sps.sawtooth(2 * np.pi * phase)          # -6 dB/oct-ish
            y = np.zeros(seg)
            for lo, hi, bw in ((300, 800, 80), (900, 2200, 120),
                               (2400, 3000, 180)):
                fc = rng.uniform(lo, hi)
                r = np.exp(-np.pi * bw / fs)
                b, a = [1 - r], [1, -2 * r * np.cos(2 * np.pi * fc / fs),
                                 r * r]
                y += sps.lfilter(b, a, src)
            y *= rng.uniform(0.5, 0.9)
        else:
            fc = rng.uniform(3500, 6000)
            r = np.exp(-np.pi * 600 / fs)
            b, a = [1 - r], [1, -2 * r * np.cos(2 * np.pi * fc / fs), r * r]
            y = 0.25 * sps.lfilter(b, a, rng.standard_normal(seg))
        env = np.minimum(k / (0.01 * fs), 1.0) \
            * np.minimum((seg - 1 - k) / (0.01 * fs), 1.0)
        x[pos:pos + seg] = y * np.clip(env, 0, 1)
        pos += seg
        voiced = not voiced
    return 0.95 * x / max(np.max(np.abs(x)), 1e-9)


def glockenspiel(fs: int = 44100, seconds: float = 1.0,
                 seed: int = 0x6106) -> np.ndarray:
    """Two struck-bar notes: sharp attack, sparse inharmonic partials
    (ratios ~1 : 2.76 : 5.40 : 8.93 like an ideal free bar), long decay."""
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    x = np.zeros(n)
    for onset, f1 in ((0.05, 1046.5), (0.5, 1318.5)):
        start = int(onset * fs)
        k = np.arange(n - start)
        note = np.zeros(n - start)
        for ratio, amp, tau in ((1.0, 1.0, 0.5), (2.76, 0.4, 0.18),
                                (5.40, 0.2, 0.08), (8.93, 0.08, 0.04)):
            f = f1 * ratio
            if f < fs / 2 * 0.95:
                note += amp * np.sin(2 * np.pi * f * k / fs
                                     + rng.uniform(0, 6.28)) \
                    * np.exp(-k / (tau * fs))
        strike = rng.standard_normal(int(0.002 * fs)) * 0.3
        note[: len(strike)] += strike
        x[start:] += 0.8 * note
    return 0.95 * x / max(np.max(np.abs(x)), 1e-9)


MATERIAL = {"castanets": castanets, "speech": speech_like,
            "glockenspiel": glockenspiel}


def main() -> None:
    """Write the material as WAVs (demo/listening): tools/material.py out/"""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tac.io.wav import write_wav

    outdir = sys.argv[1] if len(sys.argv) > 1 else "material"
    os.makedirs(outdir, exist_ok=True)
    for name, gen in MATERIAL.items():
        x = gen()
        write_wav(os.path.join(outdir, f"{name}.wav"),
                  x[:, None].astype(np.float32), 44100)
        print(name, len(x), "samples")


if __name__ == "__main__":
    main()
