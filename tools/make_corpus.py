"""Synthesize an N-clip WAV corpus for the BASELINE config-4 scale run.

BASELINE.json config 4 names "Batched corpus transcode: 10k clips"; this
tool builds that corpus from the deterministic stress material in
tools/material.py (castanets / speech-like / glockenspiel) plus seeded
tonal mixes, so the 10k-clip job (PERF.md "corpus at scale") is
reproducible bit-for-bit. Stereo 44.1 kHz, 2-s clips by default; each
clip gets a unique seed, so the corpus is 10k distinct signals, not one
clip repeated. Optionally plants one corrupt WAV (truncated header) to
exercise the quarantine path mid-run.

Usage: python tools/make_corpus.py OUT_DIR [N] [--seconds S] [--corrupt]
"""

from __future__ import annotations

import argparse
import os
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 44100


def _tonal_mix(fs: int, seconds: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    x = np.zeros_like(t)
    for _ in range(rng.integers(3, 8)):
        f = float(rng.uniform(80, 8000))
        x += rng.uniform(0.05, 0.4) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    x += 0.01 * rng.standard_normal(len(t))
    return 0.8 * x / max(1e-9, np.max(np.abs(x)))


def _make_one(args: tuple[str, int, float]) -> str:
    path, i, seconds = args
    from tools import material
    from tac.io.wav import write_wav

    kind = i % 4
    if kind == 0:
        m = material.castanets(FS, seconds, seed=0xCA57 + i)
    elif kind == 1:
        m = material.speech_like(FS, seconds, seed=0x5EEC + i)
    elif kind == 2:
        m = material.glockenspiel(FS, seconds, seed=0x610C + i)
    else:
        m = _tonal_mix(FS, seconds, seed=0x7014 + i)
    n = int(FS * seconds)
    m = np.resize(m, n)
    rng = np.random.default_rng(i)
    right = np.roll(m, rng.integers(1, 32)) * rng.uniform(0.7, 1.0)
    x = np.stack([m, right], axis=1).astype(np.float64)
    write_wav(path, x, FS)
    return path


def generate(out_dir: str, n: int, seconds: float = 2.0,
             corrupt: bool = False) -> None:
    """Synthesize the corpus: n valid clips + (optionally) ONE corrupt
    WAV under its own name (clip_corrupt.wav) — never clobbering a real
    clip, so an n-clip run really contains n valid clips.

    Idempotent: existing clip files are skipped, so re-running resumes.
    """
    os.makedirs(out_dir, exist_ok=True)
    jobs = [(os.path.join(out_dir, f"clip{i:05d}.wav"), i, seconds)
            for i in range(n)]
    jobs = [j for j in jobs if not os.path.exists(j[0])]
    if jobs:
        with Pool() as pool:
            it = pool.imap_unordered(_make_one, jobs, chunksize=64)
            for k, _ in enumerate(it):
                if (k + 1) % 1000 == 0:
                    print(f"{k + 1}/{len(jobs)}", flush=True)
    if corrupt:
        bad = os.path.join(out_dir, "clip_corrupt.wav")
        with open(bad, "wb") as f:
            f.write(b"RIFF\x00\x00\x00\x00WAVEjunk")
        print(f"planted corrupt WAV: {bad}")
    print("done")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("n", type=int, nargs="?", default=10000)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--corrupt", action="store_true",
                    help="plant one corrupt WAV (clip_corrupt.wav)")
    args = ap.parse_args()
    generate(args.out_dir, args.n, args.seconds, args.corrupt)


if __name__ == "__main__":
    main()
