"""Scalar sign-magnitude midtread quantization + block FP (oracle). SPEC.md §4.

Oracle counterpart of the reference's ``quantize.py`` (SURVEY.md §2 #7).
The scalar functions are the normative definitions; the v* aliases operate
per-element the reference way (loop) for mantissa vectors.
"""

from __future__ import annotations

import numpy as np


def QuantizeUniform(a: float, r: int) -> int:
    """Midtread R-bit (incl. sign) code of a in [-1, 1). SPEC.md §4."""
    s = 1 if a < 0 else 0
    code = int(((2 ** r - 1) * abs(a) + 1) // 2)
    code = min(code, 2 ** (r - 1) - 1)
    return (s << (r - 1)) | code


def DequantizeUniform(c: int, r: int) -> float:
    sign = -1.0 if (c >> (r - 1)) & 1 else 1.0
    mag = c & (2 ** (r - 1) - 1)
    return sign * 2.0 * mag / (2 ** r - 1)


def ScaleFactor(a: float, n_scale_bits: int, n_mant_bits: int) -> int:
    """Capped leading-zero count of the magnitude field. SPEC.md §4."""
    max_scale = 2 ** n_scale_bits - 1
    r = max_scale + n_mant_bits
    rm = r - 1
    code = QuantizeUniform(abs(a), r)
    return min(rm - code.bit_length(), max_scale) if code else max_scale


def Mantissa(a: float, scale: int, n_scale_bits: int, n_mant_bits: int) -> int:
    if n_mant_bits <= 0:
        return 0
    max_scale = 2 ** n_scale_bits - 1
    r = max_scale + n_mant_bits
    rm = r - 1
    q = QuantizeUniform(a, r)
    s = (q >> rm) & 1
    g = q & (2 ** rm - 1)
    shift = rm - scale - (n_mant_bits - 1)
    return (s << (n_mant_bits - 1)) | (g >> shift)


def DequantizeMantissa(mant: int, scale: int, n_scale_bits: int,
                       n_mant_bits: int) -> float:
    if n_mant_bits <= 0:
        return 0.0
    max_scale = 2 ** n_scale_bits - 1
    r = max_scale + n_mant_bits
    rm = r - 1
    s = (mant >> (n_mant_bits - 1)) & 1
    gm = mant & (2 ** (n_mant_bits - 1) - 1)
    shift = rm - scale - (n_mant_bits - 1)
    g = gm << shift
    if gm != 0 and shift > 0:
        g += 1 << (shift - 1)
    return DequantizeUniform((s << rm) | g, r)


def vMantissa(a: np.ndarray, scale: int, n_scale_bits: int,
              n_mant_bits: int) -> list[int]:
    return [Mantissa(x, scale, n_scale_bits, n_mant_bits) for x in a]


def vDequantizeMantissa(mant, scale: int, n_scale_bits: int,
                        n_mant_bits: int) -> np.ndarray:
    return np.array([DequantizeMantissa(int(m), scale, n_scale_bits,
                                        n_mant_bits) for m in mant])
