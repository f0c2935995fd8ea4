"""Per-band mantissa bit allocation (SPEC.md §6).

Capability parity with the reference's ``bitalloc.py`` (SURVEY.md §2 #10:
BitAlloc greedy water-fill + BitAllocUniform/ConstSNR/ConstMNR baselines),
redesigned for XLA: the reference's data-dependent Python ``while`` loop
becomes a ``lax.while_loop`` whose body does one *grant* (argmax over bands)
or one *lone-bit freeze* per iteration — fully vmappable over frames.

Bit-exactness contract (SPEC.md §10): decisions depend on floats only through
  * ``smr_q`` — the caller's SMR snapped to a 1/16 dB grid, and
  * ``need = smr_q - DEC[alloc]`` with ``DEC[k] = 6.02*k`` a shared
    host-precomputed table (single subtract, no FMA hazard),
so the NumPy oracle (tac/oracle/bitalloc.py) reproduces the allocation
integer-for-integer. Ties in the argmax go to the lowest band index in both.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

MANT_MAX = 16          # max mantissa bits per line
DB_PER_BIT = 6.02      # SNR gain per granted bit
SMR_GRID = 16.0        # SMR decision grid: 1/16 dB

# Shared decrement table: DEC[k] = 6.02 * k, k = 0..MANT_MAX.
DEC_TABLE = np.arange(MANT_MAX + 1, dtype=np.float64) * DB_PER_BIT

# Escape hatch for A/B timing: TAC_NO_WARMSTART=1 starts the while_loop
# from zeros (identical allocations either way — the warm start is exact).
_USE_WARM_START = not __import__("os").environ.get("TAC_NO_WARMSTART")


def snap_smr(smr):
    """Snap SMRs to the 1/16 dB decision grid (SPEC.md §10 item 2)."""
    return jnp.round(smr * SMR_GRID) / SMR_GRID


def _warm_start(smr_q, n_lines, budget, max_mant: int, n_bisect: int = 32,
                rounds: int = 2):
    """Water-level warm start for the greedy grant phase (parity-exact).

    Greedy's grant phase processes the event set {(band b, j-th bit)} with
    key ``need(b, j) = smr_q[b] - DEC[j-1]`` in descending-key order. For ANY
    threshold T, the prefix P(T) = {events with key > T} is granted wholly
    by greedy — in some order, before any other event — PROVIDED no band in
    the prefix ever becomes unaffordable while its prefix events remain.
    cost(P) = Σ n_lines[b] over P satisfying cost(P) <= budget is
    sufficient: spend is monotone along the event order, so remaining
    before event j is budget - spent_before_j >= n_lines[e_j] whenever the
    TOTAL cost fits — every prefix grant is affordable exactly at its turn,
    the eligibility filter never removes the argmax, and the freeze path
    needs an empty affordable set (impossible mid-prefix). Granting P(T)
    in closed form therefore lands on a state greedy itself passes through
    (frozen all-False), and the while_loop continues unchanged from there.
    (Earlier rounds used the looser margin cost <= budget - Lmax'; the
    tight condition was fuzzed against single-grant greedy over 4000
    randomized (smr, n_lines, budget) cases — identical final allocations —
    and lands the warm start on the exact water level.)

    T is found by a fixed-trip bisection on the water level — monotone:
    cost is non-increasing in T. Any converged T is valid (imprecision
    only shrinks the prefix), so no sort and no exact tie handling is
    needed — XLA sorts are the expensive part on TPU (measured: a
    [rows, 400] sort cost more than the loop iterations it saved).
    Verified allocation-identical to the serial oracle on real SMRs and
    randomized fuzz (tests/test_bitalloc.py).

    The lemma assumes only a greedy-reachable state with frozen=all-False
    (greedy's grant phase is memoryless given (alloc, remaining)), so the
    bisection APPLIES AGAIN from its own result: each extra round re-runs
    it on the residual event set {(b, j) : j >= alloc[b]}, with that
    round's unaffordable bands masked out (see below). With the tight
    affordability condition + per-round masking the tail is ~11 mean
    iterations on 128 kbps SMRs (was ~16.7 with the old margin), mostly
    lone-bit freezes and post-freeze regrants, which no threshold prefix
    can absorb; rounds=2 keeps the cheap part of the win.

    Returns (alloc0 int32[B], remaining0 int32). budget may be traced (VBR).
    """
    m = min(max_mant, MANT_MAX)
    dec = jnp.asarray(DEC_TABLE[:m], smr_q.dtype)
    n_lines = jnp.asarray(n_lines, jnp.int32)
    neg = jnp.asarray(-jnp.inf, smr_q.dtype)
    valid = n_lines > 0
    keys = jnp.where(valid[:, None], smr_q[:, None] - dec[None, :],
                     neg)                                    # [B, m]
    big = jnp.asarray(1e30, smr_q.dtype)
    jcol = jnp.arange(m)[None, :]

    alloc0 = jnp.zeros(smr_q.shape[-1], jnp.int32)
    rem0 = jnp.asarray(budget, jnp.int32)
    for _ in range(rounds):
        # bands with n_lines > remaining cannot be granted until a freeze
        # grows the reservoir, and rem only SHRINKS during the grant
        # descent — so masking their events out per round is exact (the
        # greedy argmax never selects them while the round's prefix
        # grants). Lets later rounds absorb the sub-water-level mop-up
        # grants that the global threshold cannot express.
        afford = n_lines <= rem0
        live = jnp.where(jcol >= alloc0[:, None], keys, neg)
        live = jnp.where(afford[:, None], live, neg)
        top = jnp.max(live, axis=1)                          # per-band max key

        def ok(t, live=live, rem=rem0):
            granted = live > t
            cost = jnp.sum(jnp.where(granted, n_lines[:, None], 0),
                           dtype=jnp.int32)
            # cost <= rem alone implies every prefix event was affordable
            # AT ITS TURN: spend is monotone along the descending-key
            # event order, so remaining before event j is
            # rem - spent_before_j >= rem - (cost - n_lines[e_j])
            # >= n_lines[e_j]. The earlier Lmax' margin was a looser
            # sufficient invariant; dropping it lands the warm start on
            # the exact water level (4000-case fuzz vs single-grant
            # greedy: identical final allocations — /tmp lemma fuzz,
            # round-3 perf session; loop tail ~16 -> ~5 iterations).
            return cost <= rem

        hi0 = jnp.max(jnp.where(valid, top, -big))           # ok: empty prefix
        lo0 = jnp.min(jnp.where(jnp.isfinite(live), live, big)) - 1.0

        # unrolled on purpose: under vmap each trip is a handful of tiny
        # elementwise+reduce ops, and unrolling lets XLA fuse the whole
        # chain into a few kernels instead of n_bisect sequential loop
        # dispatches (launch-latency-bound on TPU, not FLOP-bound)
        lo, hi = lo0, hi0
        for _ in range(n_bisect):
            mid = 0.5 * (lo + hi)
            good = ok(mid)
            lo = jnp.where(good, lo, mid)
            hi = jnp.where(good, mid, hi)
        grant = jnp.sum((live > hi).astype(jnp.int32), axis=1)
        alloc0 = alloc0 + grant
        rem0 = rem0 - jnp.sum(grant * n_lines)
    return alloc0, rem0


def water_fill(smr_q, n_lines, budget: int, max_mant: int = MANT_MAX):
    """Greedy water-filling with lone-bit cleanup. SPEC.md §6.

    smr_q:   f64/f32[B] grid-snapped SMRs (vmap for leading axes).
    n_lines: i32[B] lines per band (0 = band above Nyquist, never allocated).
    budget:  python int, mantissa bit budget for this block/channel.

    Returns int32[B] alloc with values in {0} ∪ [2, max_mant].

    The bulk of the grants land in one shot via the sorted-event warm start
    (_warm_start, parity-exact); the while_loop then finishes the tail. One
    iteration performs either a grant (+1 bit to the neediest affordable
    band) or freezes the highest-index lone-1-bit band (reclaiming its
    bits); terminates when no grant is affordable and no lone bits remain.
    On realistic 128 kbps SMRs the warm start cuts iterations ~70 → ~21
    mean (85 → 34 max), and the vmapped loop runs to the batch max.
    """
    nb = smr_q.shape[-1]
    dec = jnp.asarray(DEC_TABLE, smr_q.dtype)
    n_lines = jnp.asarray(n_lines, jnp.int32)
    neg = jnp.asarray(-jnp.inf, smr_q.dtype)

    def cond(state):
        _, _, _, done = state
        return ~done

    def body(state):
        alloc, remaining, frozen, _ = state
        need = smr_q - dec[alloc]
        eligible = (~frozen) & (alloc < max_mant) & (n_lines > 0) \
                   & (n_lines <= remaining)
        any_grant = jnp.any(eligible)
        # grant path: argmax of need among eligible; ties -> lowest index
        b = jnp.argmax(jnp.where(eligible, need, neg))

        # MULTI-GRANT: give b every bit it would win before any other band
        # becomes the argmax. Provably identical to k single grants: the
        # (j+1)-th consecutive grant goes to b iff its need after j grants,
        # smr_q[b] - DEC[alloc[b]+j], still STRICTLY exceeds the best other
        # eligible need (ties break to the lowest index next iteration, and
        # the other-band eligible set can only shrink as `remaining` falls,
        # so this k is a safe underestimate — never an overshoot).
        others = jnp.where(eligible & (jnp.arange(nb) != b), need, neg)
        need2 = jnp.max(others)
        j = jnp.arange(MANT_MAX + 1, dtype=jnp.int32)
        dec_bj = dec[jnp.clip(alloc[b] + j, 0, MANT_MAX)]
        ahead = (smr_q[b] - dec_bj > need2) & (alloc[b] + j < max_mant)
        k = jnp.sum(jnp.cumprod(ahead.astype(jnp.int32)),
                    dtype=jnp.int32)                         # leading run
        k = jnp.minimum(k, max_mant - alloc[b])
        k = jnp.minimum(k, remaining // jnp.maximum(n_lines[b], 1))
        k = jnp.maximum(k, 1).astype(jnp.int32)

        g_alloc = alloc.at[b].add(k)
        g_rem = remaining - k * n_lines[b]

        # freeze path: highest-index band with alloc == 1 (not frozen)
        lone = (alloc == 1) & (~frozen)
        any_lone = jnp.any(lone)
        hi = nb - 1 - jnp.argmax(lone[::-1])  # first True in reversed order
        f_alloc = alloc.at[hi].set(0)
        f_rem = remaining + n_lines[hi]
        f_frozen = frozen.at[hi].set(True)

        done = (~any_grant) & (~any_lone)
        alloc2 = jnp.where(any_grant, g_alloc,
                           jnp.where(any_lone, f_alloc, alloc))
        rem2 = jnp.where(any_grant, g_rem,
                         jnp.where(any_lone, f_rem, remaining))
        frozen2 = jnp.where(any_grant, frozen,
                            jnp.where(any_lone, f_frozen, frozen))
        return alloc2, rem2, frozen2, done

    if _USE_WARM_START:
        alloc0, rem0 = _warm_start(smr_q, n_lines, budget, max_mant)
    else:
        alloc0 = jnp.zeros(nb, jnp.int32)
        rem0 = jnp.asarray(budget, jnp.int32)
    frozen0 = jnp.zeros(nb, bool)
    state = (alloc0, rem0, frozen0, jnp.asarray(False))
    alloc, _, _, _ = jax.lax.while_loop(cond, body, state)
    return alloc


def allocate(smr, n_lines, budget: int, mode: str = "greedy",
             max_mant: int = MANT_MAX):
    """Dispatch over allocation modes (reference's four BitAlloc* variants).

    greedy / const_mnr: water-fill on masked SMR (they coincide: constant
    mask-to-noise ratio IS what the greedy loop converges to).
    const_snr: water-fill on band-peak SPL (no masking) — caller passes
    line SPLs as `smr` with use_psy=False.
    uniform: water-fill on all-zero need — round-robin from the lowest band.
    """
    if mode == "uniform":
        smr = jnp.zeros_like(smr)
    return water_fill(snap_smr(smr), n_lines, budget, max_mant)


def alloc_to_code(alloc):
    """alloc ∈ {0} ∪ [2,16] → 4-bit code c (c=0 ⇔ alloc=0, else c=alloc-1)."""
    return jnp.where(alloc > 0, alloc - 1, 0).astype(jnp.int32)


def code_to_alloc(code):
    return jnp.where(code > 0, code + 1, 0).astype(jnp.int32)
