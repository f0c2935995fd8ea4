"""MDCT / IMDCT filterbank + framing utilities (SPEC.md §1, §3).

Capability parity with the reference's ``mdct.py`` (SURVEY.md §2 #5:
MDCTslow / MDCT / IMDCT), redesigned arrays-first for TPU:

  * ``mdct_direct``/``imdct_direct`` — O(N^2) definitional forms, the oracle
    for everything else (like the reference's MDCTslow).
  * ``mdct_fft``/``imdct_fft`` — O(N log N) pre/post-twiddle FFT forms: the
    parity path (f64 on CPU, bit-matched against the NumPy oracle).
  * ``mdct_basis``/``imdct_basis`` — window-fused cosine basis matrices for
    the TPU fast path: the MDCT becomes one big [F, N] @ [N, H] matmul on the
    MXU (see tac.ops.pallas_mdct for the fused Pallas kernel).
  * ``frame_signal``/``overlap_add`` — 50%-hop framing (encode) and its
    adjoint shifted-sum (decode). No serial per-block loop anywhere: the
    reference's `priorBlock` carried state (SURVEY.md §3.1) becomes one
    half-frame of zero padding, making every frame independent → vmap.

Conventions (frozen in SPEC.md §3): N = 2H, n0 = (H+1)/2,
forward scale 2/N, inverse scale 2.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------- direct ----

def mdct_direct(x, h: int):
    """X[k] = (2/N) sum_n x[n] cos(2π/N (n+n0)(k+1/2)). x: [..., 2h] → [..., h]."""
    n = 2 * h
    n0 = (h + 1) / 2.0
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(h, dtype=np.float64)
    cos = np.cos(2.0 * np.pi / n * np.outer(nn + n0, kk + 0.5))  # [n, h]
    return (2.0 / n) * (x @ cos)


def imdct_direct(X, h: int):
    """y[n] = 2 sum_k X[k] cos(2π/N (n+n0)(k+1/2)). X: [..., h] → [..., 2h]."""
    n = 2 * h
    n0 = (h + 1) / 2.0
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(h, dtype=np.float64)
    cos = np.cos(2.0 * np.pi / n * np.outer(kk + 0.5, nn + n0))  # [h, n]
    return 2.0 * (X @ cos)


# ------------------------------------------------------------------- fft ----

def _twiddles(h: int, dtype):
    """Host-side twiddle constants for the FFT forms."""
    n = 2 * h
    n0 = (h + 1) / 2.0
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(h, dtype=np.float64)
    pre_f = np.exp(-1j * np.pi * nn / n)                       # fwd pre
    post_f = np.exp(-2j * np.pi * n0 * (kk + 0.5) / n)          # fwd post
    pre_i = np.exp(2j * np.pi * n0 * kk / n)                    # inv pre
    post_i = np.exp(1j * np.pi * (nn + n0) / n)                 # inv post
    c = np.complex64 if dtype == jnp.float32 else np.complex128
    return (jnp.asarray(pre_f, c), jnp.asarray(post_f, c),
            jnp.asarray(pre_i, c), jnp.asarray(post_i, c))


def mdct_fft(x, h: int):
    """FFT-form MDCT. x: [..., 2h] (windowed) → [..., h]. jit/vmap friendly."""
    n = 2 * h
    pre_f, post_f, _, _ = _twiddles(h, x.dtype)
    X = jnp.fft.fft(x.astype(pre_f.dtype) * pre_f, axis=-1)[..., :h]
    return (2.0 / n) * jnp.real(post_f * X).astype(x.dtype)


def imdct_fft(X, h: int):
    """FFT-form IMDCT. X: [..., h] → [..., 2h]."""
    n = 2 * h
    _, _, pre_i, post_i = _twiddles(h, X.dtype)
    Xp = X.astype(pre_i.dtype) * pre_i
    pad = [(0, 0)] * (X.ndim - 1) + [(0, n - h)]
    y = jnp.fft.ifft(jnp.pad(Xp, pad), axis=-1) * n
    return 2.0 * jnp.real(post_i * y).astype(X.dtype)


# ---------------------------------------------------------------- matmul ----

def mdct_basis(h: int, window: np.ndarray | None = None,
               dtype=np.float32) -> np.ndarray:
    """Forward basis A[n, k] with the analysis window fused in: X = x @ A."""
    n = 2 * h
    n0 = (h + 1) / 2.0
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(h, dtype=np.float64)
    a = (2.0 / n) * np.cos(2.0 * np.pi / n * np.outer(nn + n0, kk + 0.5))
    if window is not None:
        a = window[:, None] * a
    return a.astype(dtype)


def imdct_basis(h: int, window: np.ndarray | None = None,
                dtype=np.float32) -> np.ndarray:
    """Inverse basis S[k, n] with the synthesis window fused in: y = X @ S."""
    n = 2 * h
    n0 = (h + 1) / 2.0
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(h, dtype=np.float64)
    s = 2.0 * np.cos(2.0 * np.pi / n * np.outer(kk + 0.5, nn + n0))
    if window is not None:
        s = s * window[None, :]
    return s.astype(dtype)


# --------------------------------------------------------------- framing ----

def num_frames(t: int, h: int) -> int:
    """F = ceil(T/H) + 1 (one priming block + one flush block). SPEC.md §1."""
    return -(-t // h) + 1


def frame_signal(x, h: int):
    """[..., T] → [..., F, 2H] frames at hop H with H leading zeros.

    This replaces the reference's serial `priorBlock` overlap state: frame i
    covers padded samples [i*H, i*H + 2H).
    """
    t = x.shape[-1]
    f = num_frames(t, h)
    pad = [(0, 0)] * (x.ndim - 1) + [(h, (f + 1) * h - t - h)]
    xp = jnp.pad(x, pad)
    # two shifted views of the half-block grid instead of a gather (TPU
    # gathers are bandwidth-hostile; this is two slices + one concat)
    halves = xp.reshape(*xp.shape[:-1], f + 1, h)
    return jnp.concatenate([halves[..., :-1, :], halves[..., 1:, :]],
                           axis=-1)


def overlap_add(y, h: int, t: int):
    """[..., F, 2H] → [..., T]: shifted half-frame sum, drop the priming half.

    The decode-side adjoint of frame_signal — a pure shifted add, no scatter,
    so XLA lowers it to two pads and an add (fuseable, shardable; the only
    cross-frame dependency in the codec, cf. SURVEY.md §5.7).
    """
    first, second = y[..., :h], y[..., h:]
    zero = jnp.zeros_like(first[..., :1, :])
    acc = (jnp.concatenate([first, zero], axis=-2)
           + jnp.concatenate([zero, second], axis=-2))  # [..., F+1, H]
    out = acc.reshape(*acc.shape[:-2], -1)
    return out[..., h:h + t]
