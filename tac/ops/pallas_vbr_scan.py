"""Pallas TPU kernel: the ENTIRE VBR bit-reservoir scan in one program.

Why: the reservoir chain is the codec's only serial axis (SPEC.md §8 —
frame i's budget depends on frame i-1's spend), so VBR encode throughput
is per-scan-step cost × F steps. Round 2 batched the step over lanes and
ran the water-fill as a Pallas kernel per step, but each `lax.scan` step
still paid the XLA-side warm start (~64 sequential fused kernels) plus a
kernel launch — ~63→134 audio-sec/s device (PERF.md). This kernel moves
the WHOLE chain on-chip: grid = frames (TPU grid steps execute in order
on one core), the reservoir fill lives in VMEM scratch across steps, and
each step runs the water-fill while_loop (tac/ops/pallas_alloc.water_fill_tile
— the SAME body as the row-block kernel, so decisions replay
tac.bitalloc.water_fill bit-for-bit), the 7-way raw-vs-Huffman price
select (integer-identical to codec._vbr_price), and the reservoir clamp,
all without leaving the chip.

Each step first runs the in-kernel warm start
(pallas_alloc.warm_start_tile — straight-line unrolled bisection, no
per-iteration sync) so the data-dependent while_loop tail shrinks
~70 → ~17 iterations; the while_loop's vector→scalar condition sync is
the per-iteration cost inside a kernel, so trip count is everything.
TAC_VBR_SCAN_G batches G frames per grid step (block-swap amortization;
measured neutral on this box, kept for DMA-latency-bound backends).

Serves both reservoir flavors (n_lines may be per-frame for the
windowState-aware combo scan, tac/blockswitch.py): alloc/tid/used/res
outputs are byte-parity-asserted against the lax.scan path in
tests/test_pallas_vbr_scan.py and the serial oracle via the golden suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tac.huffman import MIN_M, MAX_M
from tac.ops.pallas_alloc import LANES, warm_start_tile, water_fill_tile

N_TAB = MAX_M - MIN_M + 1


def _scan_kernel(smr_ref, nl_ref, bh_ref, res0_ref,
                 alloc_ref, tid_ref, used_ref, res_ref, res_scr, *,
                 base: int, cap: int, max_mant: int, nb: int,
                 g: int, f: int, nl_per_frame: bool, unroll: int,
                 ws_rounds: int, ws_bisect: int, n_sets: int,
                 wf_prefix: int = 0, wf_max_trips: int = 0):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        res_scr[:] = res0_ref[:]                     # [Lp, 1] i32

    # G frames per grid step (unrolled): amortizes per-step block-swap
    # latency on DMA-latency-bound backends (measured neutral on this
    # box's noisy tunnel -> default G=1, see the host wrapper). Sub-steps
    # past the true frame count F are skipped (pl.when), leaving the
    # reservoir scratch untouched; their output rows are host-sliced.
    for gg in range(g):
        @pl.when(i * g + gg < f)
        def _step(gg=gg):
            res = res_scr[:]                         # [Lp, 1] i32 in [0, cap]
            smr = smr_ref[gg]                        # [Lp, 128] f32 (-inf pad)
            nl = nl_ref[gg if nl_per_frame else 0]   # [Lp, 128] i32 (0 pad)

            alloc0, rem = warm_start_tile(smr, nl, base + res,
                                          max_mant=max_mant, nb=nb,
                                          rounds=ws_rounds,
                                          n_bisect=ws_bisect)
            alloc = water_fill_tile(smr, nl, alloc0, rem,
                                    max_mant=max_mant, nb=nb,
                                    unroll=unroll, prefix=wf_prefix,
                                    max_trips=wf_max_trips)

            # pricing: integer-identical to codec._vbr_price (raw =
            # Σ alloc·n_lines; each trained set swaps in its precomputed
            # coded band cost at codable allocs), then the 3-way min with
            # tie order raw <= set1 <= set2 (SPEC §8)
            raw_b = alloc * nl                       # [Lp, 128]
            # disjoint conditions (alloc == m): the select chain is a sum
            # of deltas, tree-reduced for log depth (integer-exact)
            from tac.ops.pallas_alloc import _tree_sum
            raw = jnp.sum(raw_b, axis=1, keepdims=True,
                          dtype=jnp.int32)           # [Lp, 1]
            hufs = []
            for si in range(n_sets):
                huf_b = raw_b + _tree_sum(
                    [jnp.where(alloc == m,
                               bh_ref[gg, si * N_TAB + m - MIN_M] - raw_b,
                               0)
                     for m in range(MIN_M, MAX_M + 1)])
                hufs.append(jnp.sum(huf_b, axis=1, keepdims=True,
                                    dtype=jnp.int32))
            best_h = hufs[0]
            tid_h = jnp.full_like(best_h, 1)
            for si in range(1, n_sets):
                beat = hufs[si] < best_h             # strict: first-min ties
                tid_h = jnp.where(beat, si + 1, tid_h)
                best_h = jnp.minimum(best_h, hufs[si])
            tid = jnp.where(best_h < raw, tid_h, 0)
            used = jnp.minimum(raw, best_h)
            res2 = jnp.clip(res + base - used, 0, cap).astype(jnp.int32)

            alloc_ref[gg] = alloc
            tid_ref[gg] = tid
            used_ref[gg] = used
            res_ref[gg] = res2
            res_scr[:] = res2


@functools.partial(
    jax.jit, static_argnames=("base", "cap", "max_mant", "nb", "interpret"))
def vbr_reservoir_scan(smr_q, bits_huf, n_lines, res0, *, base: int,
                       cap: int, max_mant: int, nb: int,
                       interpret: bool = False):
    """Run the whole bit-reservoir chain on-chip.

    smr_q:    f32[F, L, B] grid-snapped SMRs, frame-major (scan order)
    bits_huf: i32[F, L, B, 7·S] coded band cost at candidate m = 2..8 per
              trained table set (S = 1 or 2; tid = 0/1/2 via the 3-way min)
    n_lines:  i32[B] shared (flat VBR) or i32[F, L, B] per-frame (combo)
    res0:     i32[L] starting reservoir fills (streaming resume)
    base/cap: python ints — per-frame budget and reservoir cap

    Returns (alloc i32[F, L, B], tid i32[F, L], used i32[F, L],
    res i32[F, L]) — exactly what the lax.scan phase 2 of
    codec._encode_vbr_lanes produces.
    """
    import os

    f, l, b = smr_q.shape
    if b > LANES:
        raise ValueError(f"vbr_reservoir_scan supports <= {LANES} bands")
    n_sets = bits_huf.shape[-1] // N_TAB
    n_tab_t = n_sets * N_TAB
    lp = max(8, -(-l // 8) * 8)
    # frames per grid step: measured NEUTRAL on this box (within-process
    # interleaved A/B, G in {1,2,4,8}: 137-148 ms medians on a 2585-step
    # chain, inside the tunnel's noise band), so the default stays 1 for
    # the cheapest compile; the G-batch path remains for DMA-latency-
    # bound backends (tests pin G=2 for parity coverage)
    g = max(int(os.environ.get("TAC_VBR_SCAN_G", 1)), 1)
    # loop-shape knobs (decision-exact at ANY setting: the warm start's
    # prefix lemma holds for any trip count, and unrolled post-done body
    # applications are the identity — pallas_alloc). Defaults measured on
    # the live chip: round-4 trip-count A/B (tools/bench_warmstart.py,
    # PERF.md) — 1 round x 12 bisect beats the old 2x20 by ~1.18x on the
    # 60-s scan (45.8 vs 54.1 ms, stable across two runs); the fixed-rate
    # water-fill kernel measured FLAT across the same grid, so its 2x20
    # defaults stand (pallas_alloc.py).
    unroll = max(int(os.environ.get("TAC_WF_UNROLL", 1)), 1)
    ws_rounds = max(int(os.environ.get("TAC_WS_ROUNDS", 1)), 1)
    ws_bisect = max(int(os.environ.get("TAC_WS_BISECT", 12)), 1)
    # prefix: straight-line body applications before the loop (decision-
    # exact at any value — post-done applications are the identity).
    # Default 12 = the measured knee (tools/bench_vbr_tail.py, round 5:
    # base/p8/p10/p12/p16 = 46.0/44.5/44.3/43.6/43.8 ms per 60-s scan —
    # each converted trip saves only the ~20% loop-sync share, so the
    # win is bounded; p16 tips into wasted straight-line work).
    # max_trips: MEASUREMENT-ONLY tail truncation (NOT decision-exact —
    # floor probes, PERF.md "VBR scan tail")
    wf_prefix = max(int(os.environ.get("TAC_WF_PREFIX", 12)), 0)
    wf_max_trips = max(int(os.environ.get("TAC_WF_MAX_TRIPS", 0)), 0)
    fp = -(-f // g) * g
    n_grid = fp // g

    # padded lanes/rows: smr = -inf, n_lines = 0 -> water_fill allocates
    # nothing there and the price sums see zeros. Padded FRAMES (f..fp)
    # are skipped entirely in-kernel (pl.when), so their values never run.
    smr_p = jnp.full((fp, lp, LANES), -jnp.inf, jnp.float32)
    smr_p = smr_p.at[:f, :l, :b].set(smr_q.astype(jnp.float32))
    n_lines = jnp.asarray(n_lines, jnp.int32)
    nl_per_frame = n_lines.ndim != 1
    if not nl_per_frame:
        nl_p = jnp.zeros((1, lp, LANES), jnp.int32) \
            .at[0, :l, :b].set(jnp.broadcast_to(n_lines, (l, b)))
        nl_map = lambda i: (0, 0, 0)
    else:
        nl_p = jnp.zeros((fp, lp, LANES), jnp.int32) \
            .at[:f, :l, :b].set(n_lines)
        nl_map = lambda i: (i, 0, 0)
    bh_p = jnp.zeros((fp, n_tab_t, lp, LANES), jnp.int32) \
        .at[:f, :, :l, :b].set(jnp.moveaxis(bits_huf, -1, 1))
    res0_p = jnp.zeros((lp, 1), jnp.int32).at[:l, 0].set(
        res0.astype(jnp.int32))

    alloc, tid, used, res = pl.pallas_call(
        functools.partial(_scan_kernel, base=int(base), cap=int(cap),
                          max_mant=max_mant, nb=b, g=g, f=f,
                          nl_per_frame=nl_per_frame, unroll=unroll,
                          ws_rounds=ws_rounds, ws_bisect=ws_bisect,
                          n_sets=n_sets, wf_prefix=wf_prefix,
                          wf_max_trips=wf_max_trips),
        out_shape=(
            jax.ShapeDtypeStruct((fp, lp, LANES), jnp.int32),
            jax.ShapeDtypeStruct((fp, lp, 1), jnp.int32),
            jax.ShapeDtypeStruct((fp, lp, 1), jnp.int32),
            jax.ShapeDtypeStruct((fp, lp, 1), jnp.int32),
        ),
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec((g, lp, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((g if nl_per_frame else 1), lp, LANES), nl_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_tab_t, lp, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, lp, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lp, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lp, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lp, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((lp, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(smr_p, nl_p, bh_p, res0_p)
    return (alloc[:f, :l, :b], tid[:f, :l, 0], used[:f, :l, 0],
            res[:f, :l, 0])
