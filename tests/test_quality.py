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


# (material, preset, floor dB) — floors = measured − 1 dB (VERDICT r3
# item 9: contracts, not tripwires). Measured round 4 on the CPU backend
# (tools/measure_quality.py, tid=2 active): 6.19/31.14/29.05/35.34/
# 10.32/37.61/24.08 respectively.
CASES = [
    ("castanets", "stereo44-128", 5.1),
    ("speech", "stereo44-128", 30.1),
    ("glockenspiel", "stereo44-128", 28.0),
    ("speech", "vbr-huffman", 34.3),
    ("castanets", "vbr-bs", 9.3),
    ("speech", "vbr-bs", 36.6),
    ("glockenspiel", "streaming-ll", 23.0),
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


def test_tid2_wins_on_transients():
    """The second trained Huffman set must keep earning its place: the
    default raw/set1/set2 pricing (huffman_sets=2) beats set-1-only
    pricing on transient material by >=0.5 dB SNR at matched bytes
    (measured +0.86 dB at -0.26% bytes, PERF.md round-4 tid2 table) —
    pins the lever so it can't silently regress (VERDICT r4 item 8)."""
    x = castanets(FS, 1.5)
    cfg2 = PRESETS["vbr-huffman"].replace(n_channels=1)     # default sets
    cfg1 = cfg2.replace(huffman_sets=1)
    d1, d2 = api.encode_array(x, cfg1), api.encode_array(x, cfg2)
    assert abs(len(d2) - len(d1)) <= 0.01 * len(d1), (len(d1), len(d2))
    snr1 = _snr(x, api.decode_array(d1)[0])
    snr2 = _snr(x, api.decode_array(d2)[0])
    assert snr2 >= snr1 + 0.5, (snr1, snr2)


def test_noise_below_masked_threshold():
    """The perceptual contract itself (VERDICT r2 item 7): on tonal
    material at 128 kbps, per-band coding-noise intensity must sit at or
    under the psy model's own masked threshold — this validates what the
    SNR floors can't (noise can be large and inaudible, small and
    audible). The JUDGE is always the line-granular threshold; since
    round 5 the fixed-rate encoder allocates under the band-granular
    bound (SPEC §5 v4), which this cross-model check holds to the finer
    model's standard. Measured round 5 (tools/measure_quality.py
    methodology, CPU backend, band encode / line judge): allocated-band
    NMR median -47.27 dB, p90 -30.57, worst cell -3.03 (line encode
    measured +0.86 here — the conservative bound protects the exposed
    cells); unallocated bands <= -9.29 dB (line: -27.52; the
    redistribution cost, still deeply masked). Bounds = measured
    + ~1.5-2.5 dB margin (VERDICT r3 item 9)."""
    import jax
    import jax.numpy as jnp

    from tac import api, bands, codec
    from tac.dsp import mdct as fb
    from tac.psy import masked_threshold
    from tools import material

    cfg = PRESETS["stereo44-128"].replace(n_channels=1)
    x = material.glockenspiel(cfg.sample_rate, 2.0).astype(np.float64)
    y = api.decode_array(api.encode_array(x, cfg), precision="fast")[0][:, 0]
    n = min(len(x), len(y))
    e = x[:n] - y[:n].astype(np.float64)

    c = codec.make_consts(cfg)
    h = cfg.n_mdct_lines
    fx = fb.frame_signal(jnp.asarray(x[None, :n]), h)[0]
    fe = fb.frame_signal(jnp.asarray(e[None, :n]), h)[0]
    alloc = np.asarray(codec.ba.code_to_alloc(
        codec.encode_clip(jnp.asarray(x[None, :n]), cfg).alloc_code))[0]

    thr_i = np.asarray(jax.vmap(
        lambda fr: masked_threshold(fr.astype(jnp.float32), c.psy))(fx))
    lines_e = np.asarray(jax.vmap(
        lambda fr: jnp.dot(fr.astype(c.dtype), c.fwd_basis))(fe))
    noise_i = c.mdct_gain * lines_e ** 2

    bol = np.asarray(c.band_of_line)
    bsum = lambda a: np.stack(
        [a[:, bol == b].sum(1) if (bol == b).any() else np.zeros(len(a))
         for b in range(bands.N_BANDS)], axis=1)
    nmr = 10 * np.log10(np.maximum(bsum(noise_i), 1e-30)
                        / np.maximum(bsum(thr_i), 1e-30))

    interior = slice(4, -4)
    got = (alloc[interior] > 0)
    vals = nmr[interior][got]
    assert np.median(vals) <= -45.0, np.median(vals)
    assert np.percentile(vals, 90) <= -28.5, np.percentile(vals, 90)
    assert vals.max() <= 0.0, vals.max()
    empty = (alloc[interior] == 0) & (np.asarray(c.n_lines) > 0)[None, :]
    assert nmr[interior][empty].max() <= -7.0
