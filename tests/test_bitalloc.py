"""Bit-allocation tests: SPEC.md §6 invariants + exact jax/oracle agreement
(the SPEC.md §10 decision-layer bit-exactness contract)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tac import bands, bitalloc as jba
from tac.oracle import bitalloc as oba


def _rand_case(rng, fs=44100, h=1024):
    n_lines = bands.lines_per_band(fs, h)
    smr = oba.snap_smr(rng.uniform(-30, 60, bands.N_BANDS))
    return smr, n_lines


@pytest.mark.parametrize("budget", [0, 100, 1000, 2500, 10**6])
def test_jax_matches_oracle(budget, rng):
    for _ in range(8):
        smr, n_lines = _rand_case(rng)
        a_o = oba.BitAlloc(budget, 16, bands.N_BANDS, n_lines, smr)
        a_j = np.asarray(jba.water_fill(jnp.asarray(smr), n_lines, budget))
        np.testing.assert_array_equal(a_j, a_o)


def test_invariants(rng):
    for budget in (0, 37, 500, 3000):
        smr, n_lines = _rand_case(rng)
        a = oba.BitAlloc(budget, 16, bands.N_BANDS, n_lines, smr)
        assert np.all((a == 0) | ((a >= 2) & (a <= 16)))     # no lone bits
        assert int(np.sum(a * n_lines)) <= budget             # budget respected
        assert np.all(a[n_lines == 0] == 0)                  # empty bands


def test_uniform_round_robin():
    n_lines = np.array([10, 10, 10, 0], np.int32)
    a = oba.BitAllocUniform(65, 16, 4, n_lines)
    # 65 bits, round-robin grants over 3 live bands: 2+2+2 = 60 used,
    # 5 remaining can't afford a 10-line grant
    np.testing.assert_array_equal(a, [2, 2, 2, 0])


def test_ties_prefer_lowest_band():
    n_lines = np.array([5, 5], np.int32)
    a_o = oba.BitAlloc(5, 16, 2, n_lines, np.zeros(2))
    a_j = np.asarray(jba.water_fill(jnp.zeros(2), n_lines, 5))
    # only 5 bits: band 0 gets 1 → lone-bit cleanup frees it → re-grant fails
    np.testing.assert_array_equal(a_o, a_j)
    assert a_o.sum() == 0


def test_vmapped_allocation(rng):
    smrs = np.stack([_rand_case(rng)[0] for _ in range(16)])
    n_lines = bands.lines_per_band(44100, 1024)
    f = jax.vmap(lambda s: jba.water_fill(s, n_lines, 2000))
    out = np.asarray(f(jnp.asarray(smrs)))
    for i in range(16):
        np.testing.assert_array_equal(
            out[i], oba.BitAlloc(2000, 16, bands.N_BANDS, n_lines, smrs[i]))


def test_warm_start_state_on_greedy_trajectory(rng):
    """The warm-start state must be one greedy itself passes through:
    replaying single grants from zero for the same number of bits must
    land on (alloc0, rem0) exactly."""
    for _ in range(16):
        smr, n_lines = _rand_case(rng)
        budget = int(rng.integers(0, 4000))
        a0, r0 = jba._warm_start(jnp.asarray(smr), n_lines, budget, 16)
        a0, r0 = np.asarray(a0), int(r0)
        assert int(np.sum(a0 * np.asarray(n_lines))) == budget - r0
        # replay greedy single grants until it has spent budget - r0 bits
        alloc = np.zeros(bands.N_BANDS, np.int64)
        remaining = budget
        while remaining > r0:
            need = smr - jba.DEC_TABLE[alloc]
            elig = (alloc < 16) & (n_lines > 0) & (n_lines <= remaining)
            assert elig.any()
            b = int(np.argmax(np.where(elig, need, -np.inf)))
            alloc[b] += 1
            remaining -= int(n_lines[b])
        assert remaining == r0
        np.testing.assert_array_equal(alloc, a0)


@pytest.mark.parametrize("max_mant", [2, 7, 16])
def test_warm_start_fuzz_all_budgets(max_mant, rng):
    """Randomized parity vs the serial oracle across budgets and caps —
    the warm start must never change the final allocation."""
    n_lines = bands.lines_per_band(44100, 1024)
    for _ in range(40):
        smr = oba.snap_smr(rng.uniform(-40, 120, bands.N_BANDS))
        budget = int(rng.integers(0, 5000))
        a_o = oba.BitAlloc(budget, max_mant, bands.N_BANDS, n_lines, smr)
        a_j = np.asarray(jba.water_fill(jnp.asarray(smr), n_lines, budget,
                                        max_mant))
        np.testing.assert_array_equal(a_j, a_o)


def test_warm_start_uniform_and_tiny_budgets():
    """All-zero SMR (uniform mode: every key group is a cross-band tie) and
    budgets around single-band affordability boundaries."""
    n_lines = bands.lines_per_band(44100, 1024)
    for budget in (0, 1, 4, 5, 9, 10, 304, 305, 999, 1282):
        smr = np.zeros(bands.N_BANDS)
        a_o = oba.BitAlloc(budget, 16, bands.N_BANDS, n_lines, smr)
        a_j = np.asarray(jba.water_fill(jnp.zeros(bands.N_BANDS), n_lines,
                                        budget))
        np.testing.assert_array_equal(a_j, a_o)


def test_traced_budget_matches_static(rng):
    """The VBR reservoir passes budget as a traced int32 — same result."""
    smr, n_lines = _rand_case(rng)
    f = jax.jit(lambda s, b: jba.water_fill(s, n_lines, b))
    for budget in (0, 777, 2000):
        a_t = np.asarray(f(jnp.asarray(smr), jnp.asarray(budget, jnp.int32)))
        a_s = np.asarray(jba.water_fill(jnp.asarray(smr), n_lines, budget))
        np.testing.assert_array_equal(a_t, a_s)
