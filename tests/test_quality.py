"""Quality floors on realistic material (SURVEY.md §2 #14, §4 item 3).

Until round 2 every R-D/SNR claim rested on multi-sine mixes; these tests
assert per-config floors on perceptually structured clips (castanets /
speech-like / glockenspiel, tools/material.py) so a psy-model or allocator
regression that only hurts real-world-shaped signals fails loudly.

Floors are ~2-3 dB below values measured at round 2 (see commit) — they
catch regressions, not noise. All material is seeded/deterministic.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tac import api
from tac.config import PRESETS
from tools.material import castanets, glockenspiel, speech_like

FS = 44100


def _snr(x, y):
    y = y[: len(x), 0]
    return 10 * np.log10(np.mean(x ** 2) / max(np.mean((x - y) ** 2), 1e-30))


@pytest.fixture(scope="module")
def mats():
    return {"castanets": castanets(FS), "speech": speech_like(FS),
            "glockenspiel": glockenspiel(FS)}


def _roundtrip(x, cfg):
    y, fs = api.decode_array(api.encode_array(x, cfg))
    assert fs == cfg.sample_rate
    return y


# (material, preset, overrides, floor dB) — measured r2: 6.2/31.1/29.1/
# 35.3/9.5/37.5/24.1 respectively
CASES = [
    ("castanets", "stereo44-128", 4.0),
    ("speech", "stereo44-128", 26.0),
    ("glockenspiel", "stereo44-128", 24.0),
    ("speech", "vbr-huffman", 30.0),
    ("castanets", "vbr-bs", 7.0),
    ("speech", "vbr-bs", 32.0),
    ("glockenspiel", "streaming-ll", 19.0),
]


@pytest.mark.parametrize("mat,preset,floor", CASES)
def test_snr_floor(mats, mat, preset, floor):
    cfg = PRESETS[preset]
    if cfg.n_channels != 1:
        cfg = cfg.replace(n_channels=1)
    y = _roundtrip(mats[mat], cfg)
    got = _snr(mats[mat], y)
    assert got > floor, f"{mat}/{preset}: {got:.1f} dB <= floor {floor}"


def test_block_switching_wins_on_castanets(mats):
    """Transient material must benefit from the switching machinery: the
    huffman+bs combo beats the plain long-block codec at the same rate."""
    x = mats["castanets"]
    cfg_long = PRESETS["stereo44-128"].replace(n_channels=1)
    cfg_bs = PRESETS["vbr-bs"].replace(n_channels=1)
    snr_long = _snr(x, _roundtrip(x, cfg_long))
    snr_bs = _snr(x, _roundtrip(x, cfg_bs))
    assert snr_bs > snr_long + 1.0, (snr_bs, snr_long)


def test_rd_monotone_on_speech(mats):
    """R-D curve on speech-like material: SNR non-decreasing in rate."""
    x = mats["speech"]
    snrs = []
    for kbps in (64, 128, 256):
        cfg = PRESETS["vbr-huffman"].replace(n_channels=1,
                                             bitrate_bps=kbps * 1000)
        snrs.append(_snr(x, _roundtrip(x, cfg)))
    assert all(b > a - 0.5 for a, b in zip(snrs, snrs[1:])), snrs
    assert snrs[-1] > snrs[0] + 5, snrs


def test_castanets_pre_echo_bounded(mats):
    """Error energy in the 12 ms before each strike must not exceed the
    strike-neighborhood error (pre-echo control via block switching)."""
    x = mats["castanets"]
    cfg = PRESETS["streaming-ll"]
    y = _roundtrip(x, cfg)[: len(x), 0]
    err = (x - y) ** 2
    # strike onsets: large jumps in short-window energy
    w = 64
    e = np.convolve(x ** 2, np.ones(w), "same")
    onsets = np.nonzero((e[w:] > 8 * e[:-w] + 1e-4))[0][:1000]
    # keep first onset of each strike (gaps > 30 ms)
    starts = [onsets[0]] if len(onsets) else []
    for o in onsets[1:]:
        if o - starts[-1] > int(0.03 * FS):
            starts.append(o)
    assert len(starts) >= 3
    pre = int(0.012 * FS)
    ratios = []
    for s in starts:
        if s < pre + w:
            continue
        pre_err = err[s - pre: s - w // 2].mean()
        at_err = err[s: s + pre].mean()
        ratios.append(pre_err / max(at_err, 1e-30))
    # pre-echo energy stays well below the error at the strike itself
    assert np.median(ratios) < 0.5, ratios
