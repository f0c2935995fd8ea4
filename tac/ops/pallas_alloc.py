"""Pallas TPU kernel for the greedy water-fill bit-allocation loop.

Why a kernel: the allocation `lax.while_loop` is ~38% of encode device
time (PERF.md) and is *launch-latency* bound — each iteration is a
handful of small-tensor VPU ops over [rows, 25] that XLA schedules as
separate fusions inside the loop body. Running the whole data-dependent
loop inside one Pallas program keeps the state ([rows, 128] alloc/need
tiles) VMEM-resident with no per-iteration scheduling overhead.

Decision parity: the kernel replays tac.bitalloc.water_fill's decision
chain bit-for-bit (same f32 DEC constants via select-sums instead of
gathers, same strict comparisons, same tie-breaks: grant argmax ties to
the LOWEST band, lone-bit freeze picks the HIGHEST band), so its
allocations equal the XLA path exactly — asserted against water_fill in
tests/test_pallas_alloc.py and fuzzed vs the serial oracle.

The multi-grant count uses an index-domain reformulation: ahead(j) is
monotone in j, so the leading-run length equals
  k = #{ m : alloc_b <= m < max_mant,  smr_b - DEC[m] > need2 },
which unrolls over the 17 static DEC constants with no table lookup.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tac.bitalloc import DB_PER_BIT, DEC_TABLE, MANT_MAX

LANES = 128          # lane-group width (bands in the VBR-scan layout,
                     # rows per grid program in the row-block kernel)


def _tree_sum(terms):
    """Pairwise-sum a list of arrays: log-depth dependency chain instead
    of a serial accumulate (integer/bool counts only — order-exact)."""
    terms = list(terms)
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _dec_of(alloc, dtype=jnp.float32):
    """DEC_TABLE[alloc] as one multiply: fl(6.02)·k == fl(fl64(6.02·k))
    for every k in [0, 16] (verified bit-exact — DEC_TABLE is arange ·
    6.02), so this equals the XLA path's table gather exactly."""
    return jnp.asarray(DB_PER_BIT, dtype) * alloc.astype(dtype)


def water_fill_tile(smr, n_lines, alloc0, rem0, *, max_mant: int, nb: int,
                    band_axis: int = 1, unroll: int = 1, prefix: int = 0,
                    max_trips: int = 0):
    """The greedy water-fill while_loop on VMEM-resident tiles.

    With band_axis=1 (the VBR reservoir-scan layout): smr f32[R, 128],
    n_lines i32[R, 128], alloc0 i32[R, 128], rem0 i32[R, 1] →
    alloc i32[R, 128]. With band_axis=0 (the row-block kernel below):
    bands live on the SUBLANE axis (padded to a multiple of 8, ~1.3x
    waste instead of the lane layout's 128/25 ≈ 5x) and rows on lanes —
    same math, reductions run along sublanes. Shared by both kernels so
    they replay tac.bitalloc.water_fill's decision chain from ONE body.
    Padded band positions (band >= nb) must carry smr = -inf / n_lines = 0.
    """
    dec32 = [np.float32(v) for v in DEC_TABLE]      # same constants as XLA
    neg = jnp.float32(-np.inf)
    ax = band_axis
    band = jax.lax.broadcasted_iota(jnp.int32, smr.shape, ax)
    band_pad = smr.shape[ax]
    pad = band >= nb                                 # padded positions: inert
    valid_band = (n_lines > 0) & ~pad

    def body(state):
        alloc, rem, frozen, _ = state
        need = smr - _dec_of(alloc)
        eligible = (frozen == 0) & (alloc < max_mant) & valid_band \
            & (n_lines <= rem)
        any_grant = jnp.any(eligible, axis=ax, keepdims=True)    # [.., 1]

        # ---- grant branch: argmax need, ties -> lowest band index
        masked = jnp.where(eligible, need, neg)
        mx = jnp.max(masked, axis=ax, keepdims=True)
        at_max = eligible & (masked == mx)
        bsel = jnp.min(jnp.where(at_max, band, band_pad), axis=ax,
                       keepdims=True)
        onehot = band == bsel
        pick = lambda a, zero: jnp.sum(jnp.where(onehot, a, zero),
                                       axis=ax, keepdims=True)
        n_b = pick(n_lines, 0)
        smr_b = pick(smr, jnp.float32(0.0))
        alloc_b = pick(alloc, 0)
        need2 = jnp.max(jnp.where(eligible & ~onehot, need, neg),
                        axis=ax, keepdims=True)
        # multi-grant: k = #{m in [alloc_b, max_mant) : smr_b - DEC[m] > need2}
        k = _tree_sum([((m >= alloc_b) & (smr_b - dec32[m] > need2)
                        ).astype(jnp.int32) for m in range(max_mant)])
        k = jnp.minimum(k, max_mant - alloc_b)
        k = jnp.minimum(k, rem // jnp.maximum(n_b, 1))
        k = jnp.maximum(k, 1)
        g_alloc = alloc + jnp.where(onehot, k, 0)
        g_rem = rem - k * n_b

        # ---- freeze branch: highest lone-1-bit band
        lone = (alloc == 1) & (frozen == 0) & ~pad
        any_lone = jnp.any(lone, axis=ax, keepdims=True)
        hisel = jnp.max(jnp.where(lone, band, -1), axis=ax, keepdims=True)
        fhot = lone & (band == hisel)
        f_alloc = jnp.where(fhot, 0, alloc)
        f_rem = rem + jnp.sum(jnp.where(fhot, n_lines, 0), axis=ax,
                              keepdims=True)
        f_frozen = jnp.where(fhot, 1, frozen)

        done = (~any_grant) & (~any_lone)
        # explicit i32: under jax_enable_x64 the python-int literals above
        # would otherwise promote the carry to i64 and break the while_loop
        alloc = jnp.where(any_grant, g_alloc,
                          jnp.where(any_lone, f_alloc, alloc)
                          ).astype(jnp.int32)
        rem = jnp.where(any_grant, g_rem,
                        jnp.where(any_lone, f_rem, rem)).astype(jnp.int32)
        frozen = jnp.where(any_grant, frozen,
                           jnp.where(any_lone, f_frozen, frozen)
                           ).astype(jnp.int32)
        return alloc, rem, frozen, jnp.all(done)

    # frozen carried as i32 0/1: Mosaic rejects i1 vector stores/selects
    state = (alloc0, rem0, jnp.zeros_like(alloc0), jnp.asarray(False))
    # prefix > 0: K straight-line body applications BEFORE the loop —
    # decision-exact for any K (post-done body applications are the
    # identity), trades K condition syncs for K always-executed bodies
    # (measured grid: PERF.md "VBR scan tail").
    for _ in range(max(prefix, 0)):
        state = body(state)
    # unroll > 1: U body applications per loop-condition check. The body
    # is the IDENTITY once done (no grant and no lone bit leave every
    # carry unchanged), so overshooting the convergence point by up to
    # U-1 applications is decision-exact; what it buys is U-fold fewer
    # vector->scalar condition syncs (the dominant per-iteration stall
    # inside a kernel - PERF.md round-3 perf session).
    if max_trips > 0:
        # MEASUREMENT HARNESS ONLY — truncates the greedy chain (NOT
        # decision-exact): bounds the tail to quantify its cost
        # (PERF.md "VBR scan tail" floor measurement). Never set in
        # production paths; parity suites run with max_trips=0.
        def cbody(s):
            a, r, fz, d, t = s
            a, r, fz, d = body((a, r, fz, d))
            return a, r, fz, d, t + 1
        st = (*state, jnp.int32(0))
        alloc, *_ = jax.lax.while_loop(
            lambda s: (~s[3]) & (s[4] < max_trips), cbody, st)
    elif unroll > 1:
        def chunk(s):
            for _ in range(unroll):
                s = body(s)
            return s
        alloc, _, _, _ = jax.lax.while_loop(lambda s: ~s[3], chunk, state)
    else:
        alloc, _, _, _ = jax.lax.while_loop(lambda s: ~s[3], body, state)
    return alloc


def warm_start_tile(smr, n_lines, rem0, *, max_mant: int, nb: int,
                    rounds: int = 2, n_bisect: int = 20,
                    band_axis: int = 1):
    """In-kernel water-level warm start (tile mirror of
    tac.bitalloc._warm_start — see its docstring for the prefix lemma).

    band_axis=1: smr f32[R, 128], n_lines i32[R, 128], rem0 i32[R, 1] →
    (alloc0 i32[R, 128], rem i32[R, 1]); band_axis=0 mirrors along the
    sublane axis (see water_fill_tile). Exactness does NOT depend on the
    trip count or on matching the XLA bisection's T: any converged
    threshold whose prefix passes the affordability check lands on a
    greedy-reachable state, and the while_loop finishes identically.
    The event keys are precomputed as fl(smr - DEC[m]) — the very f32
    values the loop's `need` uses — so the granted set is an exact prefix
    of the loop's own ordering. Straight-line (fully unrolled): inside a
    kernel each trip is ~40 VPU ops with no per-iteration sync, unlike
    the while_loop tail it shortens (~70 → ~17 data-dependent iterations).
    """
    m_cap = min(max_mant, MANT_MAX)
    dec32 = [np.float32(v) for v in DEC_TABLE]
    neg = jnp.float32(-np.inf)
    big = jnp.float32(1e30)
    ax = band_axis
    band = jax.lax.broadcasted_iota(jnp.int32, smr.shape, ax)
    valid = (n_lines > 0) & (band < nb)
    keys = [jnp.where(valid, smr - dec32[m], neg) for m in range(m_cap)]

    alloc0 = jnp.zeros_like(n_lines)
    rem = rem0                                            # [R, 1] i32
    for _ in range(rounds):
        # mask out bands whose n_lines exceed the round's remaining —
        # they stay ineligible through the whole grant descent (rem only
        # shrinks), so excluding their events is exact (see
        # tac.bitalloc._warm_start); later rounds then absorb the
        # sub-water-level mop-up grants
        afford = n_lines <= rem
        keys_r = [jnp.where(afford, k, neg) for k in keys]
        # top = keys[alloc0], recomputed arithmetically: fl(smr - 6.02·a)
        # is the very value keys[a] holds (see _dec_of) — one multiply
        # instead of a 17-deep select chain
        live_any = valid & afford & (alloc0 < m_cap)
        top = jnp.where(live_any, smr - _dec_of(alloc0), neg)
        hi = jnp.max(top, axis=ax, keepdims=True)
        lo = jnp.min(jnp.where(live_any, keys_r[m_cap - 1], big),
                     axis=ax, keepdims=True) - 1.0

        def granted(t, keys_r=keys_r):
            cnt = _tree_sum([(keys_r[m] > t).astype(jnp.int32)
                             for m in range(m_cap)])
            return jnp.maximum(cnt - alloc0, 0)

        for _ in range(n_bisect):
            mid = 0.5 * (lo + hi)
            g = granted(mid)
            cost = jnp.sum(g * n_lines, axis=ax, keepdims=True,
                           dtype=jnp.int32)
            # cost <= rem suffices (monotone event-order spend makes
            # every prefix grant affordable at its turn — see
            # tac.bitalloc._warm_start); no Lmax' margin
            good = cost <= rem
            lo = jnp.where(good, lo, mid)
            hi = jnp.where(good, mid, hi)
        g = granted(hi)
        alloc0 = alloc0 + g
        rem = rem - jnp.sum(g * n_lines, axis=ax, keepdims=True,
                            dtype=jnp.int32)
    return alloc0, rem


def _kernel(smr_ref, nl_ref, alloc0_ref, rem0_ref, out_ref, *,
            max_mant: int, nb: int, warm: bool, ws_rounds: int = 2,
            ws_bisect: int = 20):
    """Transposed row-block kernel: bands on SUBLANES, rows on lanes.

    Block shapes [B_pad, RB] with B_pad a multiple of 8 (for nb = 25
    that is 32 — ~1.3x pad waste; the old rows-on-sublanes layout padded
    25 bands to 128 LANES, 5.1x waste, and measured 0.97 ms of the
    2.09 ms fixed-rate chunk — 46% of device encode, PERF.md round-3 perf session).
    """
    if warm:
        # in-kernel warm start from raw budgets: deletes the ~64
        # sequential XLA bisection fusions the callers used to run
        # before this kernel (straight-line inside, no launch cost)
        alloc0, rem0 = warm_start_tile(smr_ref[:], nl_ref[:], rem0_ref[:],
                                       max_mant=max_mant, nb=nb,
                                       rounds=ws_rounds, n_bisect=ws_bisect,
                                       band_axis=0)
    else:
        alloc0, rem0 = alloc0_ref[:], rem0_ref[:]
    out_ref[:] = water_fill_tile(smr_ref[:], nl_ref[:], alloc0, rem0,
                                 max_mant=max_mant, nb=nb, band_axis=0)


@functools.partial(jax.jit,
                   static_argnames=("max_mant", "nb", "interpret", "warm"))
def water_fill_rows(smr_q, n_lines, alloc0, rem0, *, max_mant: int,
                    nb: int, interpret: bool = False, warm: bool = False):
    """Batched greedy water-fill: the while_loop phase of
    tac.bitalloc.water_fill over a whole row block in one kernel.

    smr_q:  f32[R, B] grid-snapped SMRs
    n_lines: i32[B], or i32[R, B] per-row (the combo's state-selected maps)
    alloc0: i32[R, B], rem0: i32[R] — the warm-start state; with
    warm=True pass rem0 = the RAW budgets (alloc0 ignored, may be zeros)
    and the water-level warm start runs in-kernel (warm_start_tile) —
    allocation-identical either way (the warm start is exact).
    Returns i32[R, B] final allocations (== jax.vmap(water_fill) exactly).

    Layout: bands on the sublane axis (padded to a multiple of 8), rows
    on lanes, 128 rows per grid program — every elementwise op in the
    loop touches B_pad/8 VREGs per 128 rows instead of the 16 the old
    rows-on-sublanes layout needed for the same rows.
    """
    r, b = smr_q.shape
    if b > LANES:
        raise ValueError(f"water_fill_rows supports <= {LANES} bands, "
                         f"got {b} (use the XLA water_fill loop)")
    bp = max(8, -(-b // 8) * 8)                      # band sublane pad
    rp = -(-r // LANES) * LANES                      # rows pad to lane blk
    grid = rp // LANES
    # padded rows/bands: rem0 = 0 and smr = -inf -> nothing eligible
    smr_p = jnp.full((bp, rp), -jnp.inf, jnp.float32)
    smr_p = smr_p.at[:b, :r].set(smr_q.astype(jnp.float32).T)
    n_lines = jnp.asarray(n_lines, jnp.int32)
    if n_lines.ndim == 2:
        nl_p = jnp.zeros((bp, rp), jnp.int32).at[:b, :r].set(n_lines.T)
    else:
        nl_p = jnp.zeros((bp, 1), jnp.int32).at[:b, 0].set(n_lines)
        nl_p = jnp.broadcast_to(nl_p, (bp, rp))
    a0_p = jnp.zeros((bp, rp), jnp.int32).at[:b, :r].set(
        alloc0.astype(jnp.int32).T)
    rem_p = jnp.zeros((1, rp), jnp.int32).at[0, :r].set(
        rem0.astype(jnp.int32))

    import os

    ws_rounds = max(int(os.environ.get("TAC_WS_ROUNDS", 2)), 1)
    ws_bisect = max(int(os.environ.get("TAC_WS_BISECT", 20)), 1)
    out = pl.pallas_call(
        functools.partial(_kernel, max_mant=min(max_mant, MANT_MAX), nb=b,
                          warm=warm, ws_rounds=ws_rounds,
                          ws_bisect=ws_bisect),
        out_shape=jax.ShapeDtypeStruct((bp, rp), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bp, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(smr_p, nl_p, a0_p, rem_p)
    return out[:b, :r].T
