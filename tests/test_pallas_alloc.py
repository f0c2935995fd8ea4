"""Pallas water-fill kernel: allocation equality vs the XLA while_loop
(tac/ops/pallas_alloc.py; interpret mode on the CPU suite — the compiled
kernel is exercised and byte-parity-checked on the real chip, where the
measured win is +27% device throughput, PERF.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tac import bands, bitalloc as ba
from tac.ops.pallas_alloc import water_fill_rows

NL = bands.lines_per_band(44100, 1024)


def _both(smr_rows, nl, budget, max_mant=16):
    smr_q = ba.snap_smr(jnp.asarray(smr_rows, jnp.float32))
    ref = jax.vmap(lambda s: ba.water_fill(s, nl, budget, max_mant))(smr_q)
    a0, r0 = jax.vmap(lambda s: ba._warm_start(
        s, nl, budget, min(max_mant, ba.MANT_MAX)))(smr_q)
    out = water_fill_rows(smr_q, jnp.asarray(nl), a0, r0,
                          max_mant=max_mant, nb=len(nl), interpret=True)
    return np.asarray(ref), np.asarray(out)


def test_kernel_equals_xla_random(rng):
    smr = rng.normal(10, 25, (64, len(NL))).astype(np.float32)
    ref, out = _both(smr, NL, 1282)
    np.testing.assert_array_equal(ref, out)


@pytest.mark.parametrize("budget", [0, 5, 12, 600, 5000])
def test_kernel_equals_xla_budgets(rng, budget):
    smr = rng.normal(0, 30, (16, len(NL))).astype(np.float32)
    ref, out = _both(smr, NL, budget)
    np.testing.assert_array_equal(ref, out)


def test_kernel_equals_xla_ties_and_extremes():
    rows = np.stack([
        np.zeros(len(NL), np.float32),               # all ties
        np.full(len(NL), 90.0, np.float32),          # everything wants bits
        np.full(len(NL), -90.0, np.float32),         # nothing does
        np.r_[np.full(5, 50.0), np.full(len(NL) - 5, -50.0)].astype(
            np.float32),                             # concentrated
    ])
    ref, out = _both(rows, NL, 1282)
    np.testing.assert_array_equal(ref, out)


def test_kernel_row_padding_inert(rng):
    """Row counts that don't divide ROW_BLK decode identically."""
    smr = rng.normal(10, 20, (3, len(NL))).astype(np.float32)
    ref, out = _both(smr, NL, 1282)
    np.testing.assert_array_equal(ref, out)


def test_kernel_equals_oracle(rng):
    """End-to-end vs the serial oracle allocator (the reference contract)."""
    from tac.oracle.bitalloc import BitAlloc
    smr = rng.normal(8, 22, (12, len(NL)))
    smr_q = np.asarray(ba.snap_smr(jnp.asarray(smr, jnp.float32)))
    _, out = _both(smr_q, NL, 1282)
    for i in range(len(smr_q)):
        want = BitAlloc(1282, 16, len(NL), np.asarray(NL),
                        smr_q[i].astype(np.float64))
        np.testing.assert_array_equal(out[i], want, err_msg=str(i))


def test_kernel_joint_ms_bands(rng):
    """The M/S joint-allocation shape (SPEC.md §11): 2B = 50 concatenated
    bands sharing a doubled budget — the exact call _joint_alloc_pairs
    makes. Kernel (warm, in-kernel start) vs the XLA allocate chain."""
    nl2 = np.concatenate([NL, NL])
    smr = rng.normal(10, 25, (16, len(nl2))).astype(np.float32)
    smr_q = ba.snap_smr(jnp.asarray(smr))
    ref = jax.vmap(lambda s: ba.allocate(
        s, jnp.asarray(nl2), 2 * 1282, "greedy", 16))(smr_q)
    zeros = jnp.zeros(smr_q.shape, jnp.int32)
    budgets = jnp.full((len(smr),), 2 * 1282, jnp.int32)
    out = water_fill_rows(smr_q, jnp.asarray(nl2), zeros, budgets,
                          max_mant=16, nb=len(nl2), interpret=True,
                          warm=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_kernel_in_kernel_warm_start(rng):
    """warm=True (warm_start_tile runs inside the kernel from raw
    budgets) must equal the externally-warm-started call exactly."""
    smr = rng.normal(10, 25, (32, len(NL))).astype(np.float32)
    smr_q = ba.snap_smr(jnp.asarray(smr))
    a0, r0 = jax.vmap(lambda s: ba._warm_start(s, NL, 1282, 16))(smr_q)
    ext = water_fill_rows(smr_q, jnp.asarray(NL), a0, r0,
                          max_mant=16, nb=len(NL), interpret=True)
    zeros = jnp.zeros(smr_q.shape, jnp.int32)
    budgets = jnp.full((len(smr),), 1282, jnp.int32)
    ink = water_fill_rows(smr_q, jnp.asarray(NL), zeros, budgets,
                          max_mant=16, nb=len(NL), interpret=True,
                          warm=True)
    np.testing.assert_array_equal(np.asarray(ext), np.asarray(ink))
