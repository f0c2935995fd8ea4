"""Psychoacoustic model: masked thresholds and signal-to-mask ratios.

Capability parity with the reference's ``psychoac.py`` (SURVEY.md §2 #9:
SPL/Intensity/Thresh/Bark, Masker spreading, getMaskedThreshold, CalcSMRs),
re-designed as ONE fused XLA graph per frame (the BASELINE.json:5 mandate):

  * the reference's per-masker Python loop becomes a dense
    [MAX_MASKERS x H] broadcast of the two-slope spreading function;
  * peak picking is a vectorized local-max mask, pair-compacted (strict
    peaks are never adjacent) into a two-key sort with static top-K
    shapes under vmap;
  * the fast-mode spectrum is a hann-fused DFT by MXU matmul (XLA:TPU's
    FFT is VPU-lowered and was over half the encode chunk); parity mode
    keeps the f64 FFT for oracle bit-exactness;
  * per-band reductions are dense static-slice reduces over the
    compile-time band ranges (no TPU scatters).

Everything here is pure jnp on [N]-sized vectors — vmapped over frames and
channels by tac.codec. All formulas are frozen in SPEC.md §5.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import ops as jops

import os

from tac import bands
from tac.dsp.window import hann_window, window_fn

_NEG = -1e30  # "minus infinity" that stays finite in f32

_LOG2_10 = 3.321928094887362      # log2(10); dB -> log2-intensity is /10*this
_KDOWN2 = 2.7 * _LOG2_10          # 27 dB/Bark lower slope in log2/Bark

# near-minimax degree-5 fit of 2^f on [-0.5, 0.5]; max f32 relative error
# 2.2e-7 (~2 ulp) — fitted by Lawson-reweighted lstsq, checked in-repo
# (tests/test_psy.py::test_exp2_fast_accuracy).
_EXP2_C = (1.0000000715489792, 0.693146967208921, 0.24022120218837253,
           0.055507133177071524, 0.009675515620859394, 0.0013276376792533775)


# ------------------------------------------------------- scalar formulas ----

def spl_from_intensity(i):
    """SPL(I) = max(96 + 10 log10 I, -30) dB."""
    return jnp.maximum(96.0 + 10.0 * jnp.log10(jnp.maximum(i, 1e-40)), -30.0)


def intensity_from_spl(spl):
    return jnp.power(10.0, (spl - 96.0) / 10.0)


def thresh_quiet_db(f):
    """Threshold in quiet (dB SPL), f in Hz (array ok)."""
    fk = jnp.maximum(f, 20.0) / 1000.0
    return (3.64 * fk ** -0.8
            - 6.5 * jnp.exp(-0.6 * (fk - 3.3) ** 2)
            + 1e-3 * fk ** 4)


def bark(f):
    """Bark(f) = 13 atan(0.76 f/1k) + 3.5 atan((f/7.5k)^2)."""
    return 13.0 * jnp.arctan(0.76 * f / 1000.0) + 3.5 * jnp.arctan((f / 7500.0) ** 2)


# ---------------------------------------------------------- static state ----

class PsyConsts(NamedTuple):
    """Per-config compile-time constants (host-built, closed over by jit)."""
    hann: jnp.ndarray            # [N] psy analysis window
    fft_gain: float              # 4 / (N^2 * mean(hann^2))
    mdct_gain: float             # 8 / mean(codec_window^2)
    freqs: jnp.ndarray           # [H] line center freqs (shared fft/mdct grid)
    zline: jnp.ndarray           # [H] Bark of each line
    quiet_i: jnp.ndarray         # [H] threshold-in-quiet intensity at lines
    band_of_line: jnp.ndarray    # [H] int32
    n_lines: jnp.ndarray         # [N_BANDS] int32
    noise_z: jnp.ndarray         # [N_BANDS] Bark of band centers
    line_valid: jnp.ndarray      # [H] bool: line below fs/2 (always true here)
    band_ranges: tuple           # ((start, end), ...) static line runs
    fft_cos: object              # [N, H] hann-fused DFT cos basis (fast mode)
    fft_sin: object              # [N, H] hann-fused DFT sin basis (fast mode)
    max_maskers: int
    delta_tonal: float
    delta_noise: float
    noise_maskers: bool
    # band-granular threshold mode (psy_granularity="band", SPEC §5):
    band_thresh: bool = False
    zedge_lo: object = None      # [N_BANDS] Bark of each band's first line
    zedge_hi: object = None      # [N_BANDS] Bark of each band's last line
    quiet_band_i: object = None  # [N_BANDS] min quiet intensity over band


def _bark_np(f):
    return 13.0 * np.arctan(0.76 * f / 1000.0) + 3.5 * np.arctan((f / 7500.0) ** 2)


def _thresh_quiet_db_np(f):
    fk = np.maximum(f, 20.0) / 1000.0
    return (3.64 * fk ** -0.8 - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
            + 1e-3 * fk ** 4)


def make_consts(cfg) -> PsyConsts:
    """Host-side (pure NumPy — safe to call at jit trace time)."""
    h = cfg.n_mdct_lines
    n = 2 * h
    dt = np.float64 if cfg.precision == "parity" else np.float32
    w = window_fn(cfg.window, n, cfg.kbd_alpha)
    hw = hann_window(n)
    f = bands.line_freqs(cfg.sample_rate, h)
    quiet = 10.0 ** ((_thresh_quiet_db_np(f) - 96.0) / 10.0)
    if cfg.precision == "parity":
        fft_cos = fft_sin = None     # parity path keeps the f64 FFT
    else:
        # hann-fused DFT-by-matmul bases: XLA:TPU's FFT measured 0.56 ms
        # per 1024-row chunk — over half the whole fixed-rate encode —
        # while the MXU does the same contraction in ~0.1 ms (PERF.md).
        # |X|^2 needs only bins 0..H-1 of the real-input DFT.
        nk = np.arange(n)[:, None] * (np.arange(h)[None, :] * (2 * np.pi / n))
        fft_cos = jnp.asarray(hw[:, None] * np.cos(nk), dt)
        fft_sin = jnp.asarray(hw[:, None] * np.sin(nk), dt)
    # band-granular mode constants: each band's line run is contiguous and
    # z is increasing in line index, so the band's extreme-line Barks are
    # where any unimodal-in-z masker spread attains its per-band minimum;
    # quiet is not unimodal (the 3.3 kHz dip), so its band min is exact.
    zl = _bark_np(f)
    ranges = bands.band_line_ranges(cfg.sample_rate, h)
    zlo = np.zeros(bands.N_BANDS)
    zhi = np.zeros(bands.N_BANDS)
    qb = np.ones(bands.N_BANDS)
    for b, (s, e) in enumerate(ranges):
        if e > s:
            zlo[b], zhi[b] = zl[s], zl[e - 1]
            qb[b] = quiet[s:e].min()
    return PsyConsts(
        fft_cos=fft_cos,
        fft_sin=fft_sin,
        hann=jnp.asarray(hw, dt),
        fft_gain=float(4.0 / (n * n * np.mean(hw ** 2))),
        mdct_gain=float(8.0 / np.mean(w ** 2)),
        freqs=jnp.asarray(f, dt),
        zline=jnp.asarray(zl, dt),
        quiet_i=jnp.asarray(quiet, dt),
        band_of_line=jnp.asarray(bands.band_of_line(cfg.sample_rate, h)),
        n_lines=jnp.asarray(bands.lines_per_band(cfg.sample_rate, h)),
        band_ranges=ranges,
        noise_z=jnp.asarray(_bark_np(bands.band_center_freqs(cfg.sample_rate)), dt),
        line_valid=jnp.asarray(np.ones(h, bool)),
        max_maskers=cfg.max_maskers,
        delta_tonal=cfg.delta_tonal_db,
        delta_noise=cfg.delta_noise_db,
        noise_maskers=cfg.psy_noise_maskers,
        # parity ALWAYS uses the line-granular model (the oracle's), and
        # "band" engages only on the paths where its round-5 A/B won:
        # plain fixed-rate lr coding. Measured boundaries (PERF.md):
        # blockswitch legs REGRESS under the band bound (streaming-ll
        # glockenspiel −5.5 dB — coarse short-frame bands make the
        # conservative min far looser), and under VBR the tid=2 lever's
        # +0.86 dB collapses to +0.04 (the trained sets carry line-mode
        # mantissa statistics). Those paths keep the line model until
        # they get their own A/B (+ retrained tables for VBR).
        # "band_all" forces the band bound on ANY fast config (the
        # scope-extension A/B knob; quality gates are the caller's job)
        band_thresh=(cfg.precision == "fast"
                     and (getattr(cfg, "psy_granularity", "line")
                          == "band_all"
                          or (cfg.psy_granularity == "band"
                              and not cfg.use_block_switch
                              and not cfg.use_huffman
                              and getattr(cfg, "stereo_mode", "lr")
                              == "lr"))),
        zedge_lo=jnp.asarray(zlo, dt),
        zedge_hi=jnp.asarray(zhi, dt),
        quiet_band_i=jnp.asarray(qb, dt),
    )


# --------------------------------------------------------------- kernels ----

def band_slice_max(x, ranges: tuple, fill):
    """Per-band max of x[..., H] via static slices → [..., N_BANDS].

    Bit-identical to segment_max over the (contiguous) band map — max is
    order-independent — but compiles to dense fused reduces instead of a
    scatter-max (TPU scatters serialize per update; three of these sat in
    the encode profile, PERF.md round-3 perf session). Empty bands yield `fill`.
    """
    cols = [jnp.max(x[..., s:e], axis=-1) if e > s
            else jnp.full(x.shape[:-1], fill, x.dtype)
            for s, e in ranges]
    return jnp.stack(cols, axis=-1)


def band_slice_sum(x, ranges: tuple):
    """Per-band sum of x[..., H] via static slices → [..., N_BANDS].
    Exact for integer dtypes (addition commutes); for floats the
    reduction ORDER differs from scatter-add — only use where the sum
    is integer or a ULP change is acceptable. Empty bands yield 0."""
    cols = [jnp.sum(x[..., s:e], axis=-1) if e > s
            else jnp.zeros(x.shape[:-1], x.dtype)
            for s, e in ranges]
    return jnp.stack(cols, axis=-1)


def _exp2_fast(t):
    """Cheap f32 exp2 for the TAC_FAST_SPREAD=1 spreading sum (~10 VPU ops).

    The input is a masking exponent, bounded by construction, so: clamp to
    [-126, 126], split by the 1.5*2^23 magic-add round-to-nearest, degree-5
    polynomial on the [-0.5, 0.5] fraction (max rel err 2.2e-7), and scale
    by 2^n built with integer bit arithmetic on the rounding constant's
    payload. exp2(-126) ~ 1.2e-38 stands in for 0 (vs quiet_i >= 1e-12:
    invisible). Accuracy pinned under jit AND eager (test_psy.py). On the
    v5e this chain did NOT beat XLA's exp10 lowering in situ (PERF.md
    round 4: the spread grid is traversal-bound) — hence default off.
    """
    t = jnp.clip(t, -126.0, 126.0)
    big = jnp.float32(3 * 2 ** 22)              # 1.5 * 2^23
    r = t + big                                  # mantissa now holds round(t)
    # bits(1.5*2^23 + n) == 0x4B400000 + n: the integer part comes back
    # OUT of the bitcast payload, never as the float (t + big) - big —
    # XLA's algebraic simplifier cancels that float form to plain t under
    # jit (constant reassociation), which silently drops the fractional
    # polynomial (f == 0) and leaves a 2^round(t) staircase: up to 41%
    # error, caught as a 1.5 dB jit-vs-eager SMR divergence in round 4.
    # A bitcast is opaque to the simplifier, so this form survives.
    ri = jax.lax.bitcast_convert_type(r, jnp.int32)
    ni = ri - 0x4B400000                         # round(t) as an int32
    f = t - ni.astype(jnp.float32)               # in [-0.5, 0.5]
    p = _EXP2_C[5]
    for k in (4, 3, 2, 1, 0):
        p = p * f + _EXP2_C[k]
    si = (ni + 127) << 23                        # bits(2^n), n in [-126, 127]
    return p * jax.lax.bitcast_convert_type(si, jnp.float32)


def _spread_sum_fast(e2, zm, su, zline):
    """Fast-mode fused spreading sum in the log2-intensity domain.

    e2: [M] log2 of each masker's effective peak intensity (tonal AND noise
        maskers share the axis; invalid slots carry _NEG),
    zm: [M] masker Bark positions, su: [M] up-slope in log2/Bark,
    zline: [H] line Barks. Returns summed masking intensity [H].

    The two-slope spread intensity is exp2 of a min of two linear-in-z
    functions: down branch e2 - KDOWN*(zm - z) = (e2 - KDOWN*zm) + KDOWN*z,
    up branch e2 - su*(z - zm) = (e2 + su*zm) - su*z; min() selects the
    correct branch everywhere because each branch upper-bounds the other on
    its wrong side (su, KDOWN >= 0). With the per-masker intercepts hoisted,
    the [M, H] grid is 1 add + 1 fma + min + the _exp2_fast chain per
    element. Summation order over M matches jnp.sum on the exp10 [M, H]
    spread tensor; values move only by the exp approximation. Measured
    0.94-0.98x vs exp10 on the v5e (PERF.md round 4) — default off.
    """
    a = e2 - _KDOWN2 * zm                        # [M] down-branch intercept
    b = e2 + su * zm                             # [M] up-branch intercept
    t = jnp.minimum(a[:, None] + (_KDOWN2 * zline)[None, :],
                    b[:, None] - su[:, None] * zline[None, :])
    return jnp.sum(_exp2_fast(t), axis=0)


def _up_slope_log2(lm):
    """Level-dependent upper spreading slope, log2-intensity per Bark."""
    up_db = jnp.maximum(27.0 - 0.367 * jnp.maximum(lm - 40.0, 0.0), 0.0)
    return up_db * (_LOG2_10 / 10.0)


def _spread_spl(lm, zm, delta, zline):
    """Two-slope Schroeder spreading (SPEC.md §5): maskers [K] → lines [H].

    Returns the spread masking SPL contribution [K, H].
    """
    dz = zline[None, :] - zm[:, None]                       # [K, H]
    up_slope = jnp.maximum(27.0 - 0.367 * jnp.maximum(lm - 40.0, 0.0), 0.0)
    drop = jnp.where(dz < 0, 27.0 * (-dz), up_slope[:, None] * dz)
    return (lm - delta)[:, None] - drop


def _spectrum_intensity(time_frame, c: PsyConsts):
    """[N] time frame → [H] psy spectrum intensity (FFT or MXU DFT)."""
    h = c.freqs.shape[0]
    if c.fft_cos is None:            # parity: f64 FFT, oracle-identical
        xf = jnp.fft.fft(time_frame.astype(c.hann.dtype) * c.hann)[:h]
        return c.fft_gain * jnp.abs(xf) ** 2                 # [H] intensity
    x = time_frame.astype(c.hann.dtype)  # fast: DFT as two MXU matmuls
    re = jnp.dot(x, c.fft_cos, preferred_element_type=x.dtype)
    im = jnp.dot(x, c.fft_sin, preferred_element_type=x.dtype)
    return c.fft_gain * (re * re + im * im)


def _tonal_maskers(ii, c: PsyConsts):
    """[H] intensities → (peak_i[H], top_i[K], top_idx[K], lm[K], zm[K],
    valid[K], k). Op-for-op the round-3 formulation (see comments)."""
    h = c.freqs.shape[0]
    # --- tonal maskers: interior local maxima, ±1-bin aggregation
    left = jnp.concatenate([jnp.full((1,), jnp.inf, ii.dtype), ii[:-1]])
    right = jnp.concatenate([ii[1:], jnp.full((1,), jnp.inf, ii.dtype)])
    is_peak = (ii > left) & (ii >= right)
    agg = ii + jnp.concatenate([jnp.zeros(1, ii.dtype), ii[:-1]]) \
             + jnp.concatenate([ii[1:], jnp.zeros(1, ii.dtype)])
    peak_i = jnp.where(is_peak, agg, 0.0)
    k = min(c.max_maskers, h)

    # intensity-weighted center frequency over the 3 aggregated bins.
    # The numerator Σ ii[j]·f[j] over {idx-1, idx, idx+1} (edge-clamped)
    # is a per-LINE quantity: build it with two edge-replicated shifts of
    # the ii·f product and carry it through the top-k sort as a payload —
    # the six per-masker gathers this replaces were 61% of encode device
    # time (TPU gathers are slow; a sort payload is nearly free). Same
    # products, same left-to-right addition order, same stable lowest-
    # index tie-break as lax.top_k: bit-exact vs the gather formulation.
    prod = ii * c.freqs
    num_line = (jnp.concatenate([prod[:1], prod[:-1]]) + prod
                + jnp.concatenate([prod[1:], prod[-1:]]))
    # strict peaks are never adjacent (peak at i forces ii[i] >= ii[i+1],
    # peak at i+1 forces ii[i+1] > ii[i]), so each line PAIR holds at most
    # one candidate: compact [H] -> [H/2] losslessly before the sort.
    # Within-pair the nonzero entry wins; all-zero pairs keep index 2j but
    # are masked by `valid` downstream exactly like the zero entries the
    # uncompacted sort produced. Relative order of candidates is preserved
    # (pair order == line order), so the stable tie-break is unchanged and
    # the kept masker set is bit-identical to sorting all H lines.
    if k <= h // 2:
        pa, pb = peak_i[0::2], peak_i[1::2]
        sel_b = pb > pa
        cand_i = jnp.where(sel_b, pb, pa)
        cand_idx = (jnp.arange(h // 2, dtype=jnp.int32) * 2
                    + sel_b.astype(jnp.int32))
        cand_num = jnp.where(sel_b, num_line[1::2], num_line[0::2])
    else:                                    # tiny frames: sort everything
        cand_i = peak_i
        cand_idx = jnp.arange(h, dtype=jnp.int32)
        cand_num = num_line
    # two-key sort: cand_idx is strictly increasing, so ordering by
    # (-value, index) reproduces the stable tie-break exactly while
    # letting XLA drop the implicit stability iota (4th sort operand)
    neg_key, top_idx, fm_num = jax.lax.sort(
        (-cand_i, cand_idx, cand_num), num_keys=2, is_stable=False)
    top_i = -neg_key[:k]
    top_idx, fm_num = top_idx[:k], fm_num[:k]
    valid = top_i > 0.0
    fm = fm_num / jnp.maximum(top_i, 1e-40)
    lm = spl_from_intensity(top_i)                           # [K]
    zm = bark(fm)
    return peak_i, top_i, top_idx, lm, zm, valid, k


def _noise_band_maskers(ii, peak_i, top_i, top_idx, valid, k, c: PsyConsts):
    """Per-band noise maskers → (ln[B] SPL, nvalid[B]).

    Bins swallowed by a kept tonal masker (±1) are excluded from noise.
    The kept set {top_idx[j] : valid[j]} is reconstructed at LINE level
    from the kth value + stable-tie index bound, so no [K, H] distance
    tensor is built (its reduce_or was 16% of the encode chunk): a line
    is kept iff its aggregated peak intensity strictly beats the kth
    sorted value, or equals it with index at most the largest kept tie
    index (stable sort keeps lowest indices first) — and is positive,
    mirroring `valid`."""
    h = c.freqs.shape[0]
    thr_k = top_i[k - 1]
    tie_hi = jnp.max(jnp.where((top_i == thr_k) & valid, top_idx, -1))
    line_idx = jnp.arange(h, dtype=jnp.int32)
    kept = (peak_i > 0.0) & ((peak_i > thr_k)
                             | ((peak_i == thr_k) & (line_idx <= tie_hi)))
    near_peak = (kept
                 | jnp.concatenate([kept[1:], kept[:1] & False])
                 | jnp.concatenate([kept[:1] & False, kept[:-1]]))
    noise_line_i = jnp.where(near_peak, 0.0, ii)
    noise_i = jops.segment_sum(noise_line_i, c.band_of_line,
                               num_segments=bands.N_BANDS)
    return spl_from_intensity(noise_i), noise_i > 0.0


def masked_threshold(time_frame, c: PsyConsts):
    """Masked-threshold intensity at each line. time_frame: [N] → [H].

    One fused graph: FFT → intensities → peak pick → top-K tonal maskers →
    dense spreading → (optional) per-band noise maskers → intensity sum with
    threshold in quiet.
    """
    ii = _spectrum_intensity(time_frame, c)
    peak_i, top_i, top_idx, lm, zm, valid, k = _tonal_maskers(ii, c)

    # TAC_FAST_SPREAD=1 (trace-time): the whole two-slope spread+sum
    # (tonal AND noise maskers on one axis) in the log2-intensity domain
    # with a ~10-op exp2 chain instead of exp10. MEASURED DEAD END on the
    # v5e, default OFF (PERF.md round 4): whole-encode A/B 0.92x,
    # isolated masked_threshold 0.937x — the [M, H] spreading stage is
    # bound by grid traversal + the masker-axis reduction, not by the
    # per-cell transcendental, so cutting exp op-count buys nothing (and
    # the same accounting rejects the suffix-sum down-slope decomposition:
    # the level-dependent up-slope branch keeps the full grid). Kept,
    # tested (test_psy.py), for A/B on other backends.
    fast_spread = (c.fft_cos is not None
                   and os.environ.get("TAC_FAST_SPREAD") == "1")
    lg = _LOG2_10 / 10.0
    if fast_spread:
        e2 = jnp.where(valid, (lm - c.delta_tonal - 96.0) * lg, _NEG)
        su = _up_slope_log2(lm)
        # invalid slots carry fm = 0/0 = NaN under XLA:CPU's flush-to-zero
        # (the 1e-40 guard is subnormal) → zm = NaN, which would poison the
        # whole masker SUM through the intercepts. The slow path is immune
        # (it rescues AFTER the spread); here rescue zm itself. isfinite
        # also covers a valid-but-subnormal top_i whose fm overflowed.
        zm_f = jnp.where(valid & jnp.isfinite(zm), zm, 0.0)
        if not c.noise_maskers:
            return _spread_sum_fast(e2, zm_f, su, c.zline) + c.quiet_i
    else:
        spread = _spread_spl(lm, zm, c.delta_tonal, c.zline)     # [K, H]
        spread = jnp.where(valid[:, None], spread, _NEG)
        thr_i = jnp.sum(intensity_from_spl(spread) * valid[:, None], axis=0)

    if c.noise_maskers:
        ln, nvalid = _noise_band_maskers(ii, peak_i, top_i, top_idx,
                                         valid, k, c)
        if fast_spread:
            e2n = jnp.where(nvalid, (ln - c.delta_noise - 96.0) * lg, _NEG)
            return _spread_sum_fast(
                jnp.concatenate([e2, e2n]),
                jnp.concatenate([zm_f, c.noise_z.astype(zm.dtype)]),
                jnp.concatenate([su, _up_slope_log2(ln)]),
                c.zline) + c.quiet_i
        nspread = _spread_spl(ln, c.noise_z, c.delta_noise, c.zline)  # [B, H]
        thr_i = thr_i + jnp.sum(intensity_from_spl(nspread) * nvalid[:, None], axis=0)

    return thr_i + c.quiet_i


def masked_threshold_bands(time_frame, c: PsyConsts):
    """Band-granular masked threshold (psy_granularity="band"): [N] → [B].

    The formulation change the round-5 roofline closure points at: the
    line-granular [M, H] spread grid is at the VPU's arithmetic floor
    (PERF.md), so the remaining factor comes from evaluating masking at
    CRITICAL-BAND granularity — the resolution masking is defined at
    (the reference's own threshold integrates per band downstream, and
    production codecs compute per-partition thresholds). Construction:
    every masker's two-slope spread is unimodal in Bark and each band
    owns a contiguous, z-increasing line run, so its minimum over a
    band's lines sits at one of the band's two EXTREME lines. Evaluating
    the spread at those 2B edge Barks and taking the per-masker edge min
    gives Σ_m min_band I_m + min_band quiet ≤ threshold(line) for every
    line in the band — a CONSERVATIVE band threshold (never masks more
    than the line-granular model), at [M, 2B] work instead of [M, H]
    (~20x less for H=1024). The resulting band SMR upper-bounds the
    line-granular band SMR, so no band can lose allocation priority
    through under-masking; tests pin the quality outcome.
    """
    ii = _spectrum_intensity(time_frame, c)
    peak_i, top_i, top_idx, lm, zm, valid, k = _tonal_maskers(ii, c)

    zedges = jnp.concatenate([c.zedge_lo, c.zedge_hi])       # [2B]
    nb = bands.N_BANDS

    sp_t = _spread_spl(lm, zm, c.delta_tonal, zedges)        # [K, 2B]
    sp_t = jnp.where(valid[:, None], sp_t, _NEG)
    it = intensity_from_spl(sp_t) * valid[:, None]
    thr_b = jnp.sum(jnp.minimum(it[:, :nb], it[:, nb:]), axis=0)   # [B]

    if c.noise_maskers:
        ln, nvalid = _noise_band_maskers(ii, peak_i, top_i, top_idx,
                                         valid, k, c)
        sp_n = _spread_spl(ln, c.noise_z, c.delta_noise, zedges)   # [B, 2B]
        inn = intensity_from_spl(sp_n) * nvalid[:, None]
        thr_b = thr_b + jnp.sum(jnp.minimum(inn[:, :nb], inn[:, nb:]),
                                axis=0)

    return thr_b + c.quiet_band_i


def calc_smrs(time_frame, mdct_lines, c: PsyConsts, mdct_gain=None):
    """SMR per scale-factor band. time_frame: [N], mdct_lines: [H] (pre-
    rescale). Returns [N_BANDS] f32/f64; empty bands get a large negative.

    mdct_gain overrides the window-power gain 8/mean(w^2) (needed by the
    block-switch start/stop windows whose power differs from the long
    window; may be a traced scalar selected per window state)."""
    gain = c.mdct_gain if mdct_gain is None else mdct_gain
    if c.band_thresh:                # band-granular mode (SPEC §5)
        thr_spl_b = spl_from_intensity(masked_threshold_bands(time_frame, c))
        line_spl = spl_from_intensity(
            gain * mdct_lines.astype(thr_spl_b.dtype) ** 2)
        smr = band_slice_max(line_spl, c.band_ranges, _NEG) - thr_spl_b
        return jnp.where(c.n_lines > 0, smr, _NEG)
    thr_spl = spl_from_intensity(masked_threshold(time_frame, c))
    line_spl = spl_from_intensity(gain * mdct_lines.astype(thr_spl.dtype) ** 2)
    smr_line = line_spl - thr_spl
    smr = band_slice_max(smr_line, c.band_ranges, _NEG)
    return jnp.where(c.n_lines > 0, smr, _NEG)
