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


def test_exp2_fast_accuracy():
    """The fast-spread exp2 chain (psy._exp2_fast) is ~2-ulp accurate on the
    masking-exponent range and exact-enough at the clamp edges — UNDER JIT:
    XLA's algebraic simplifier cancelled the original (t + big) - big
    round-to-nearest split to plain t, silently dropping the fractional
    polynomial (a 2^round(t) staircase, 41% worst error) while the eager
    path stayed correct. The eager leg is asserted too, but jit is the
    contract."""
    import jax

    t = jnp.asarray(np.linspace(-126.0, 30.0, 400001), jnp.float32)
    ref = np.exp2(np.asarray(t, np.float64))
    for fn in (jax.jit(jpsy._exp2_fast), jpsy._exp2_fast):
        got = np.asarray(fn(t), np.float64)
        rel = np.abs(got - ref) / ref
        assert rel.max() < 5e-7, rel.max()
    # the _NEG sentinel (-1e30) must clamp to a denormal-range zero stand-in
    assert float(jpsy._exp2_fast(jnp.float32(-1e30))) < 1.5e-38


def test_fast_spread_matches_exp10_formulation(sines_frame):
    """TAC_FAST_SPREAD=1 log2-domain spread+sum (psy._spread_sum_fast) vs
    the production exp10 formulation: same maskers, same slopes, thresholds
    within 1e-3 dB (the approximation budget is ~2e-7 relative). The knob
    is a measured perf dead end on the v5e (PERF.md round 4, default off)
    but stays correct for A/B on other backends."""
    import os, importlib

    x, fs = sines_frame
    cfg = CodecConfig(sample_rate=fs, n_channels=1, n_mdct_lines=1024,
                      precision="fast")
    c = jpsy.make_consts(cfg)
    assert c.fft_cos is not None

    # frames 1-2 are silence-heavy (castanet attack + decay tails): they
    # exercise the invalid-masker lanes whose fm is 0/0=NaN under FTZ —
    # the fast path must rescue zm (a NaN poisons the whole masker sum)
    from tools import material
    cast = material.castanets(fs, 2048 * 3 / fs + 0.05)
    frames = np.stack([np.asarray(x), cast[:2048], cast[2048:4096]])
    frames = jnp.asarray(frames, jnp.float32)

    import jax
    # jit, not bare vmap: the exp2 regression this guards against only
    # appears after XLA's simplification pipeline runs (see
    # test_exp2_fast_accuracy). The gate is read at trace time, so set the
    # env BEFORE tracing this leg (fresh consts object -> fresh trace).
    os.environ["TAC_FAST_SPREAD"] = "1"
    try:
        importlib.reload(jpsy)
        c1 = jpsy.make_consts(cfg)
        thr_fast = np.asarray(
            jax.jit(jax.vmap(lambda f: jpsy.masked_threshold(f, c1)))(frames),
            np.float64)
    finally:
        os.environ.pop("TAC_FAST_SPREAD", None)
        importlib.reload(jpsy)
    assert np.isfinite(thr_fast).all()

    c0 = jpsy.make_consts(cfg)
    thr_ref = np.asarray(
        jax.jit(jax.vmap(lambda f: jpsy.masked_threshold(f, c0)))(frames),
        np.float64)
    db = np.abs(10 * np.log10(thr_fast / np.maximum(thr_ref, 1e-300)))
    assert db.max() < 1e-3, db.max()


# ------------------- band-granular threshold (psy_granularity="band") -------

def test_band_threshold_is_conservative_bound():
    """SPEC §5 v4: the band threshold lower-bounds the line threshold at
    EVERY line of every band — on random frames and on real transient
    material (per-masker edge-min + exact quiet band min)."""
    import jax
    from tools import material

    fs = 44100
    cfg = CodecConfig(sample_rate=fs, n_channels=1, n_mdct_lines=1024,
                      precision="fast", psy_granularity="band")
    c = jpsy.make_consts(cfg)
    assert c.band_thresh
    rng = np.random.default_rng(5)
    cast = material.castanets(fs, 2048 * 2 / fs + 0.05)
    frames = np.stack([0.3 * rng.standard_normal(2048),
                       cast[:2048], cast[2048:4096]])
    fj = jnp.asarray(frames, jnp.float32)
    tb = np.asarray(jax.jit(jax.vmap(
        lambda f: jpsy.masked_threshold_bands(f, c)))(fj))
    tl = np.asarray(jax.jit(jax.vmap(
        lambda f: jpsy.masked_threshold(f, c)))(fj))
    for b, (s, e) in enumerate(c.band_ranges):
        if e > s:
            assert (tb[:, b] <= tl[:, s:e].min(axis=1) * (1 + 1e-5)).all(), b


def test_band_smr_upper_bounds_line_smr():
    """Band-granular SMR >= line-granular SMR per band (the allocation-
    priority guarantee the conservative bound buys)."""
    import jax
    from tools import material

    fs = 44100
    x = material.glockenspiel(fs, 1.0)
    fr = jnp.asarray(x[4096:4096 + 2048], jnp.float32)
    cfgb = CodecConfig(sample_rate=fs, n_channels=1, n_mdct_lines=1024,
                       precision="fast", psy_granularity="band")
    cfgl = cfgb.replace(psy_granularity="line")
    cb, cl = jpsy.make_consts(cfgb), jpsy.make_consts(cfgl)
    from tac.dsp import window as win, mdct as fb
    w = win.window_fn(cfgb.window, 2048)
    lines = jnp.asarray(np.asarray(fr) @ fb.mdct_basis(1024, w, np.float32))
    smr_b = np.asarray(jpsy.calc_smrs(fr, lines, cb))
    smr_l = np.asarray(jpsy.calc_smrs(fr, lines, cl))
    live = np.asarray(cb.n_lines) > 0
    assert (smr_b[live] >= smr_l[live] - 1e-3).all()


def test_parity_mode_ignores_band_granularity():
    """Parity precision always uses the line-granular (oracle) model —
    the knob must not disturb parity consts or bytes (goldens pin the
    stream; this pins the mechanism)."""
    cfg = CodecConfig(sample_rate=44100, n_channels=1,
                      precision="parity", psy_granularity="band")
    c = jpsy.make_consts(cfg)
    assert not c.band_thresh
