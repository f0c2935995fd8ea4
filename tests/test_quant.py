"""Quantizer tests: SPEC.md §4 known values + jax/oracle agreement.

Mirrors the reference's quantize.py self-test strategy (SURVEY.md §4:
known scalar↔code pairs) plus cross-implementation property tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tac import quant
from tac.oracle import quantize as oq


def test_quantize_uniform_known_values():
    # 8-bit midtread: 1.0 saturates at 127, -1.0 at sign|127
    assert oq.QuantizeUniform(1.0, 8) == 127
    assert oq.QuantizeUniform(-1.0, 8) == (1 << 7) | 127
    assert oq.QuantizeUniform(0.0, 8) == 0
    # midtread: tiny values round to 0
    assert oq.QuantizeUniform(1.0 / 255, 8) == 1
    assert oq.QuantizeUniform(0.99, 8) == int((255 * 0.99 + 1) // 2)


@pytest.mark.parametrize("r", [2, 3, 5, 8, 12, 16])
def test_quantize_roundtrip_monotone(r, rng):
    a = rng.uniform(-1, 1, 512)
    codes = [oq.QuantizeUniform(x, r) for x in a]
    back = np.array([oq.DequantizeUniform(c, r) for c in codes])
    assert np.max(np.abs(back - a)) <= 1.0 / (2 ** r - 1) + 1e-12


@pytest.mark.parametrize("r", [2, 5, 8, 16])
def test_vectorized_matches_scalar(r, rng):
    a = rng.uniform(-1, 1, 512)
    v = np.asarray(quant.quantize_uniform(jnp.asarray(a), r))
    s = np.array([oq.QuantizeUniform(x, r) for x in a])
    np.testing.assert_array_equal(v, s)
    dv = np.asarray(quant.dequantize_uniform(jnp.asarray(v), r, jnp.float64))
    ds = np.array([oq.DequantizeUniform(c, r) for c in v])
    np.testing.assert_allclose(dv, ds, rtol=0, atol=1e-15)


@pytest.mark.parametrize("m", [2, 4, 9, 16])
def test_scale_factor_and_mantissa_parity(m, rng):
    s = 4
    a = np.concatenate([rng.uniform(-1, 1, 200),
                        rng.uniform(-1e-4, 1e-4, 200),
                        [0.0, 1.0, -1.0, 0.5, 2.0 ** -15]])
    sf_j = np.asarray(quant.scale_factor(jnp.asarray(a), s, m))
    sf_o = np.array([oq.ScaleFactor(abs(x), s, m) for x in a])
    np.testing.assert_array_equal(sf_j, sf_o)
    mant_j = np.asarray(quant.mantissa(jnp.asarray(a), jnp.asarray(sf_j), s, m))
    mant_o = np.array([oq.Mantissa(x, int(f), s, m)
                       for x, f in zip(a, sf_o)])
    np.testing.assert_array_equal(mant_j, mant_o)
    dq_j = np.asarray(quant.dequantize_mantissa(
        jnp.asarray(mant_j), jnp.asarray(sf_j), s, m, jnp.float64))
    dq_o = np.array([oq.DequantizeMantissa(int(q), int(f), s, m)
                     for q, f in zip(mant_o, sf_o)])
    np.testing.assert_allclose(dq_j, dq_o, rtol=0, atol=1e-15)


def test_block_fp_error_bound(rng):
    """Block-FP with scale from band max: error <= one mantissa step."""
    s, m = 4, 6
    band = rng.uniform(-0.5, 0.5, 64)
    sf = oq.ScaleFactor(np.max(np.abs(band)), s, m)
    back = oq.vDequantizeMantissa(oq.vMantissa(band, sf, s, m), sf, s, m)
    step = 2.0 ** (-(sf + m - 1))
    assert np.max(np.abs(back - band)) <= step


def test_zero_alloc_mantissa_is_zero():
    a = jnp.asarray([0.5, -0.3])
    assert np.all(np.asarray(quant.mantissa(a, jnp.asarray([0, 0]), 4, 0)) == 0)
    out = quant.dequantize_mantissa(jnp.asarray([0, 0]),
                                    jnp.asarray([0, 0]), 4, 0, jnp.float64)
    assert np.all(np.asarray(out) == 0.0)
