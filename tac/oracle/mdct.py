"""MDCT/IMDCT (oracle, NumPy f64). SPEC.md §3.

Oracle counterpart of the reference's ``mdct.py`` (SURVEY.md §2 #5:
MDCTslow + FFT-form MDCT/IMDCT). Conventions frozen in SPEC.md §3:
N = 2H, n0 = (H+1)/2, forward scale 2/N, inverse scale 2.
"""

from __future__ import annotations

import numpy as np


def MDCTslow(data: np.ndarray, a: int, b: int,
             isInverse: bool = False) -> np.ndarray:
    """O(N^2) definitional form; a = b = H for the 50%-overlap codec."""
    n = a + b
    h = n // 2
    n0 = (b + 1) / 2.0
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(h, dtype=np.float64)
    cos = np.cos(2.0 * np.pi / n * np.outer(nn + n0, kk + 0.5))
    if isInverse:
        return 2.0 * (data @ cos.T)
    return (2.0 / n) * (data @ cos)


def MDCT(data: np.ndarray, a: int, b: int) -> np.ndarray:
    """FFT form: pre-twiddle exp(-i pi n/N) -> FFT -> post-twiddle."""
    n = a + b
    h = n // 2
    n0 = (b + 1) / 2.0
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(h, dtype=np.float64)
    pre = np.exp(-1j * np.pi * nn / n)
    post = np.exp(-2j * np.pi * n0 * (kk + 0.5) / n)
    X = np.fft.fft(data * pre)[:h]
    return (2.0 / n) * np.real(post * X)


def IMDCT(data: np.ndarray, a: int, b: int) -> np.ndarray:
    """Inverse FFT form (SPEC.md §3)."""
    n = a + b
    h = n // 2
    n0 = (b + 1) / 2.0
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(h, dtype=np.float64)
    pre = np.exp(2j * np.pi * n0 * kk / n)
    post = np.exp(1j * np.pi * (nn + n0) / n)
    y = np.fft.ifft(np.concatenate([data * pre, np.zeros(n - h)])) * n
    return 2.0 * np.real(post * y)
