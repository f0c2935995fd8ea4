"""Pallas fused MDCT kernel vs the jnp reference (interpret mode on CPU;
the TPU path is exercised by bench/kernels on hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tac.dsp import mdct as fb
from tac.dsp.window import sine_window
from tac.ops.pallas_mdct import mdct_frames_pallas


@pytest.mark.parametrize("h,t_extra", [(256, 0), (256, 123), (1024, 57)])
def test_matches_jnp_reference(h, t_extra, rng):
    basis = fb.mdct_basis(h, sine_window(2 * h), np.float32)
    x = rng.standard_normal((2, h * 24 + t_extra)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = mdct_frames_pallas(jnp.asarray(x), h, basis)
    ref = fb.frame_signal(jnp.asarray(x), h) @ jnp.asarray(basis)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6 * np.max(np.abs(np.asarray(ref))))


def test_mono_and_odd_frames(rng):
    h = 256
    basis = fb.mdct_basis(h, sine_window(2 * h), np.float32)
    x = rng.standard_normal((1, h * 3 + 1)).astype(np.float32)  # F = 5
    with pltpu.force_tpu_interpret_mode():
        out = mdct_frames_pallas(jnp.asarray(x), h, basis)
    ref = fb.frame_signal(jnp.asarray(x), h) @ jnp.asarray(basis)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
