"""Rate-distortion sweep report (SURVEY.md §5.5; BASELINE config 3).

Encodes the standard multi-sine + transient test material across the
32-256 kbps ladder in fixed-rate and Huffman-VBR modes and prints a JSONL
table (one line per point: kbps nominal/achieved, SNR) plus a summary.

Run: python tools/rd_report.py [--wav path] [--parity]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_material(fs: int = 44100, seconds: float = 2.0) -> np.ndarray:
    t = np.arange(int(fs * seconds)) / fs
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.43, 440), (0.24, 554), (0.15, 660),
                           (0.12, 880), (0.05, 4400), (0.03, 8800)])
    x = np.stack([sig, 0.8 * sig], 1)
    rng = np.random.default_rng(422)
    x += 0.01 * rng.standard_normal(x.shape)
    for pos in (len(t) // 3, 2 * len(t) // 3):          # transients
        burst = 0.5 * np.exp(-np.arange(600) / 90.0) \
            * np.sin(2 * np.pi * 3000 * np.arange(600) / fs)
        x[pos:pos + 600, 0] += burst
    return np.clip(x, -0.99, 0.99)


def snr_db(x, y):
    n = min(len(x), len(y))
    e = x[:n] - y[:n]
    return 10 * np.log10(np.mean(x[:n] ** 2) / max(np.mean(e ** 2), 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", help="use this WAV instead of synthetic")
    ap.add_argument("--parity", action="store_true",
                    help="f64 parity mode (needs JAX_ENABLE_X64)")
    args = ap.parse_args()

    from tac import api
    from tac.config import PRESETS

    if args.wav:
        from tac.io.wav import read_wav
        x, fs = read_wav(args.wav)
    else:
        fs = 44100
        x = test_material(fs)
    dur = len(x) / fs
    prec = "parity" if args.parity else "fast"

    rows = []
    for mode, preset in (("fixed", "stereo44-128"), ("vbr", "vbr-huffman"),
                         ("vbr-bs", "vbr-bs")):
        for kbps in (32, 64, 96, 128, 192, 256):
            cfg = PRESETS[preset].replace(bitrate_bps=kbps * 1000,
                                          sample_rate=fs, precision=prec)
            data = api.encode_array(x, cfg)
            y, _ = api.decode_array(data, precision=prec)
            row = {"mode": mode, "kbps_nominal": kbps,
                   "kbps_achieved": round(len(data) * 8 / dur / 1000, 1),
                   "snr_db": round(snr_db(x, y), 2)}
            rows.append(row)
            print(json.dumps(row))
    best = {}
    for r in rows:
        best.setdefault(r["kbps_nominal"], {})[r["mode"]] = r["snr_db"]
    gains = [v["vbr"] - v["fixed"] for v in best.values()
             if "vbr" in v and "fixed" in v]
    print(json.dumps({"summary": "vbr_gain_db_mean",
                      "value": round(float(np.mean(gains)), 2)}))


if __name__ == "__main__":
    main()
