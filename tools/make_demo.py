"""Generate the deterministic demo/test WAV set (SURVEY.md §2 #14).

The reference ships castanets/harpsichord/speech-like material; this tool
synthesizes equivalent test classes (tonal harmonic, transient clicks,
noise-like, speech-ish formant sweep) so every demo and listening test is
reproducible from the repo. Run: python tools/make_demo.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 44100


def harmonic(seconds=3.0, f0=262.0):
    t = np.arange(int(FS * seconds)) / FS
    env = np.minimum(1.0, t * 8) * np.exp(-t * 0.3)
    x = sum((0.5 / k) * np.sin(2 * np.pi * f0 * k * t) for k in range(1, 10))
    return 0.6 * env * x / np.max(np.abs(x))


def castanet_like(seconds=3.0):
    rng = np.random.default_rng(422)
    x = np.zeros(int(FS * seconds))
    for pos in rng.integers(0, len(x) - 4000, 24):
        n = 3000
        click = np.exp(-np.arange(n) / 200.0) * rng.standard_normal(n)
        x[pos:pos + n] += click * 0.8
    return 0.7 * x / np.max(np.abs(x))


def noise_like(seconds=3.0):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(int(FS * seconds))
    # gentle lowpass via cumulative mean-removal
    x = np.convolve(x, np.ones(8) / 8, "same")
    return 0.4 * x / np.max(np.abs(x))


def speech_like(seconds=3.0):
    t = np.arange(int(FS * seconds)) / FS
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.5 * t)              # pitch wobble
    phase = 2 * np.pi * np.cumsum(f0) / FS
    glottal = np.sin(phase) + 0.5 * np.sin(2 * phase) + 0.25 * np.sin(3 * phase)
    formant = np.sin(2 * np.pi * (500 + 300 * np.sin(2 * np.pi * 1.3 * t)) * t)
    syll = 0.5 * (1 + np.sign(np.sin(2 * np.pi * 3.1 * t)))  # on/off
    x = glottal * (0.6 + 0.4 * formant) * syll
    return 0.5 * x / np.max(np.abs(x))


def main(outdir: str = "demo") -> None:
    from tac.io.wav import write_wav

    os.makedirs(outdir, exist_ok=True)
    for name, fn in (("harmonic", harmonic), ("castanet", castanet_like),
                     ("noise", noise_like), ("speech", speech_like)):
        x = fn()
        stereo = np.stack([x, np.roll(x, 7) * 0.9], 1)
        path = os.path.join(outdir, f"{name}.wav")
        write_wav(path, stereo, FS)
        print("wrote", path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "demo")
