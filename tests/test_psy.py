"""Psychoacoustic-model tests: closed-form values (SURVEY.md §0) +
jax-vs-oracle threshold/SMR agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

from tac import psy as jpsy
from tac.config import CodecConfig
from tac.oracle import psychoac as opsy


def test_bark_closed_form():
    np.testing.assert_allclose(opsy.Bark(100.0), 0.99, atol=0.02)
    np.testing.assert_allclose(opsy.Bark(1000.0), 8.51, atol=0.02)
    np.testing.assert_allclose(opsy.Bark(10000.0), 22.4, atol=0.1)
    np.testing.assert_allclose(np.asarray(jpsy.bark(jnp.asarray([100.0, 1000.0, 10000.0]))),
                               [opsy.Bark(100.0), opsy.Bark(1000.0), opsy.Bark(10000.0)],
                               rtol=1e-12)


def test_thresh_quiet_minimum_near_3_4khz():
    f = np.linspace(100, 16000, 2000)
    t = opsy.Thresh(f)
    fmin = f[np.argmin(t)]
    assert 2500 < fmin < 4500
    np.testing.assert_allclose(np.asarray(jpsy.thresh_quiet_db(jnp.asarray(f))),
                               t, rtol=1e-10)


def test_spl_intensity_inverse():
    spl = np.linspace(-20, 96, 50)
    np.testing.assert_allclose(
        np.asarray(jpsy.spl_from_intensity(jpsy.intensity_from_spl(jnp.asarray(spl)))),
        spl, rtol=1e-10)


@pytest.fixture(scope="module")
def sines_frame():
    """The Music-422-style multi-sine test signal (SURVEY.md §4)."""
    fs, n = 48000, 2048
    t = np.arange(n) / fs
    comps = [(0.43, 440), (0.24, 550), (0.15, 660), (0.12, 880),
             (0.05, 4400), (0.03, 8800)]
    return sum(a * np.cos(2 * np.pi * f * t) for a, f in comps), fs


def test_masked_threshold_matches_oracle(sines_frame):
    x, fs = sines_frame
    cfg = CodecConfig(sample_rate=fs, n_channels=1, n_mdct_lines=1024,
                      precision="parity")
    c = jpsy.make_consts(cfg)
    thr_j = np.asarray(jpsy.masked_threshold(jnp.asarray(x), c))
    thr_o = opsy.getMaskedThreshold(x, fs)
    np.testing.assert_allclose(thr_j, thr_o, rtol=1e-9)


def test_threshold_above_quiet_and_peaks_masked(sines_frame):
    x, fs = sines_frame
    thr = opsy.SPL(opsy.getMaskedThreshold(x, fs))
    h = 1024
    freqs = (np.arange(h) + 0.5) * fs / (2 * h)
    quiet = opsy.Thresh(freqs)
    assert np.all(thr >= quiet - 1e-9)
    # threshold near the 440 Hz masker must sit well above quiet
    k440 = int(440 / fs * 2 * h)
    assert thr[k440] > quiet[k440] + 20


def test_calc_smrs_matches_oracle(sines_frame, rng):
    x, fs = sines_frame
    x = x + 1e-4 * rng.standard_normal(len(x))
    cfg = CodecConfig(sample_rate=fs, n_channels=1, n_mdct_lines=1024,
                      precision="parity")
    c = jpsy.make_consts(cfg)
    from tac.oracle.mdct import MDCT
    from tac.oracle.window import sine_window
    w = sine_window(2048)
    lines = MDCT(w * x, 1024, 1024)
    smr_j = np.asarray(jpsy.calc_smrs(jnp.asarray(x), jnp.asarray(lines), c))
    smr_o = opsy.CalcSMRs(x, lines, 0, fs, w)
    mask = smr_o > -1e29
    np.testing.assert_allclose(smr_j[mask], smr_o[mask], atol=1e-8)
