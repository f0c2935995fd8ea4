"""Pallas TPU kernel: MSB-first field packing (device bit packer hot path).

Why: with the round-3 kernels in place, the XLA compare-reduce packer
(tac.ops.bitpack.pack_rows) was ~87% of the fixed-rate device encode —
2.05 ms of a 2.35 ms 1024-row chunk (measured on-chip; PERF.md). Both
kernels here compute the identical sorted segment-OR with rows across
the vector tile ([8, 128] = 1024 rows per grid step), the field axis on
the inner grid dimension (FB fields per step, accumulated across steps
into the same output block), and c0/c1 (each field's word0 / word0+1
contributions) precomputed in XLA where they fuse into the quantize
graph:

  * _kernel (TAC_PACK_WIN=0): register passes of WB=8 words; a
    fori_loop over the step's fields adds contributions via
    compare-selects — W32 compare-adds per field;
  * _kernel_win (default): a WL=8-word register window anchored per
    GF=12-field group (group bit span <= 31 + 12*16 < WL*32, so every
    contribution lands in-window), flushed once per group — WL ops per
    field plus W32*WL/GF per group, a 2-3x op cut that grows with W32
    (VBR/combo capacities reach W32 = 208).

  Fields are processed in bit-position order per row, so the integer
  adds equal bitwise OR exactly as in pack_rows (fields never share
  bits; beyond-capacity fields drop identically: their word/window
  index matches no accumulator / no flushed output word).

Bit-exact vs pack_rows by construction (pure integer ops, same drop
semantics) — asserted in tests/test_device_pack.py (interpret mode on
CPU, live on TPU) for every stream family's (vals, wids) shape.

Dispatch: pack_rows itself routes here on TPU backends for row counts
that fill the tile (tac/ops/bitpack.py); TAC_PALLAS_PACK=0 disables at
trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_SUB, ROWS_LANE = 8, 128          # rows per grid step = 8 * 128
FB = 252                              # fields per grid step (21 window groups)
WB = 8                                # words per register pass


def _kernel(c0_ref, c1_ref, w0_ref, out_ref, *, w32: int, fb: int):
    j = pl.program_id(1)

    zero = jnp.zeros((ROWS_SUB, ROWS_LANE), jnp.uint32)
    u0 = jnp.uint32(0)
    for w_lo in range(0, w32, WB):
        nw = min(WB, w32 - w_lo)

        def step(f, accs, w_lo=w_lo, nw=nw):
            c0 = c0_ref[0, f]
            c1 = c1_ref[0, f]
            rel = w0_ref[0, f] - w_lo
            return tuple(
                accs[i]
                + jnp.where(rel == i, c0, u0)
                + jnp.where(rel == i - 1, c1, u0)
                for i in range(nw))

        accs = lax.fori_loop(0, fb, step, (zero,) * nw)
        for i in range(nw):
            @pl.when(j == 0)
            def _init(i=i, w_lo=w_lo, accs=accs):
                out_ref[0, w_lo + i] = accs[i]

            @pl.when(j > 0)
            def _acc(i=i, w_lo=w_lo, accs=accs):
                out_ref[0, w_lo + i] += accs[i]


WL = 8                                # rolling register window (words)
GF = 12                               # fields per window group: 31 bits of
                                      # start offset + 12*16 field bits stay
                                      # inside WL*32 = 256 bits, so every
                                      # c0/c1 of a group lands in the window


def _kernel_win(c0_ref, c1_ref, w0_ref, out_ref, *, w32: int, fb: int):
    """Windowed variant: per GF-field group, contributions accumulate in
    a WL-word register window anchored at the group's first word index
    (per row), then one flush adds the window into the output block. The
    naive kernel pays W32 compare-adds per FIELD; this pays WL per field
    plus W32*WL per GROUP — a 2-3x op cut for the VBR/combo capacities
    (W32 up to 208) and ~2x for raw (W32 = 48)."""
    j = pl.program_id(1)

    zero = jnp.zeros((ROWS_SUB, ROWS_LANE), jnp.uint32)
    u0 = jnp.uint32(0)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def group(g, carry):
        base = w0_ref[0, g * GF]                 # [8, 128] i32 per row
        win = (zero,) * WL
        for ff in range(GF):
            c0 = c0_ref[0, g * GF + ff]
            c1 = c1_ref[0, g * GF + ff]
            rel = w0_ref[0, g * GF + ff] - base  # in [0, WL-1]
            win = tuple(
                win[i]
                + jnp.where(rel == i, c0, u0)
                + jnp.where(rel == i - 1, c1, u0)
                for i in range(WL))
        for w in range(w32):
            relw = w - base
            add = win[0] if WL == 1 else jnp.where(relw == 0, win[0], u0)
            for i in range(1, WL):
                add = add + jnp.where(relw == i, win[i], u0)
            out_ref[0, w] += add
        return carry

    lax.fori_loop(0, fb // GF, group, 0)


@functools.partial(jax.jit, static_argnames=("w32", "interpret"))
def scatter_words_rows(c0, c1, word0, *, w32: int, interpret=False):
    """Sorted segment-OR of per-field word contributions, on the TPU tile.

    c0, c1: uint32[R, NF] — each field's contribution to its first word
    and to the spill word; word0: int32[R, NF] — the first word's index
    (non-decreasing along the field axis). Returns uint32[R, w32] with
    words[r, w] = OR of {c0[r, f] : word0 == w} | {c1[r, f] : word0 == w-1},
    identical to tac.ops.bitpack.pack_rows's reduce (out-of-range fields
    drop).
    """
    import os

    r, nf = c0.shape
    rows = ROWS_SUB * ROWS_LANE
    g = -(-r // rows)
    rp = g * rows
    win = os.environ.get("TAC_PACK_WIN") != "0"
    if win:
        # field blocks must hold whole GF-field window groups
        fb = FB if nf >= FB else max(GF, -(-nf // GF) * GF)
    else:
        fb = FB if nf >= FB else max(8, nf)
    nfp = -(-nf // fb) * fb

    def stage(a, dtype):
        ap = jnp.zeros((rp, nfp), dtype).at[:r, :nf].set(a.astype(dtype))
        return ap.reshape(g, ROWS_SUB, ROWS_LANE, nfp).transpose(0, 3, 1, 2)

    c0T = stage(c0, jnp.uint32)
    c1T = stage(c1, jnp.uint32)
    # padded fields/rows stage as word0 = 0 with c0 = c1 = 0: they add
    # zero to word 0/1, which is a no-op — no masking needed
    w0T = stage(word0, jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel_win if win else _kernel, w32=w32, fb=fb),
        out_shape=jax.ShapeDtypeStruct((g, w32, ROWS_SUB, ROWS_LANE),
                                       jnp.uint32),
        grid=(g, nfp // fb),
        in_specs=[
            pl.BlockSpec((1, fb, ROWS_SUB, ROWS_LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb, ROWS_SUB, ROWS_LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb, ROWS_SUB, ROWS_LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w32, ROWS_SUB, ROWS_LANE),
                               lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(c0T, c1T, w0T)
    return out.transpose(0, 2, 3, 1).reshape(rp, w32)[:r]
