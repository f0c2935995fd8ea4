"""Pallas TPU kernel: fused framing + window + MDCT (BASELINE.json:5).

The jnp fast path materializes the 50%-overlap frame matrix in HBM
(`frame_signal` → [F, N] where the signal is duplicated 2x) and then runs
one big matmul. This kernel fuses the three steps: each grid step DMAs the
raw signal span it needs from HBM ONCE, builds its frame tile in VMEM with
static strided slices, applies the window, and feeds the MXU against the
VMEM-resident basis — halving HBM traffic on the encode filterbank and
removing the intermediate array entirely.

Numerically identical to `windowed_frames @ basis` up to f32 matmul
reassociation; the jnp path stays as oracle and fallback (CPU/interpret).

Layout: grid over frame tiles; x is pre-padded host-side to
[(F+1)*H] per channel exactly like tac.dsp.mdct.frame_signal.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_F = 8                       # frames per grid step (f32 sublane)


def _mdct_kernel(x_ref, basis_ref, out_ref, span_ref, frames_ref, sem):
    """One tile: DMA span → strided frame build → window·frame @ basis.

    x_ref:      HBM [C, Tp/H, H]  padded signal as half-block rows
    basis_ref:  VMEM [N, H]       window-fused MDCT basis
    out_ref:    VMEM [1, TILE_F, H] output lines tile
    span_ref:   VMEM [TILE_F+1, H] scratch: the signal span (half-block rows)
    frames_ref: VMEM [TILE_F, N]  scratch: de-overlapped frame tile
    """
    ch = pl.program_id(0)
    i = pl.program_id(1)
    n = frames_ref.shape[1]
    h = n // 2
    # two 8-row-aligned DMAs (Mosaic requires sublane-multiple extents);
    # rows [i*8, i*8+16) cover this tile's 9 needed half-blocks
    d0 = pltpu.make_async_copy(
        x_ref.at[ch, pl.ds(i * TILE_F, TILE_F), :],
        span_ref.at[pl.ds(0, TILE_F), :], sem.at[0])
    d1 = pltpu.make_async_copy(
        x_ref.at[ch, pl.ds(i * TILE_F + TILE_F, TILE_F), :],
        span_ref.at[pl.ds(TILE_F, TILE_F), :], sem.at[1])
    d0.start()
    d1.start()
    d0.wait()
    d1.wait()
    for j in range(TILE_F):      # static unroll: 50%-overlap frame rows
        frames_ref[j, :h] = span_ref[j, :]
        frames_ref[j, h:] = span_ref[j + 1, :]
    out_ref[0, :, :] = jnp.dot(frames_ref[:, :], basis_ref[:, :],
                               preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnums=(2,))
def _mdct_pallas(xp, basis, f_pad: int):
    """xp: [C, (F_pad+1)*H] padded signal; basis: [N, H] → [C, F_pad, H]."""
    n, h_lines = basis.shape
    h = n // 2
    c = xp.shape[0]
    xp = xp.reshape(c, -1, h)        # half-block rows for 2-D DMA tiling
    return pl.pallas_call(
        _mdct_kernel,
        grid=(c, f_pad // TILE_F),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec((n, h_lines), lambda ch, i: (0, 0),
                         memory_space=pltpu.VMEM),      # basis resident
        ],
        out_specs=pl.BlockSpec((1, TILE_F, h_lines),
                               lambda ch, i: (ch, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, f_pad, h_lines), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * TILE_F, h), jnp.float32),
            pltpu.VMEM((TILE_F, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, basis)


def mdct_frames_pallas(x, h: int, basis):
    """x: [..., T] signal → [..., F, H] windowed MDCT lines.

    Fused equivalent of `frame_signal(x, h) @ basis` (window inside basis).
    Pads the frame count to a TILE_F multiple; extra frames are zeros and
    are sliced off before returning.
    """
    from tac.dsp.mdct import num_frames

    t = x.shape[-1]
    f = num_frames(t, h)
    f_pad = -(-f // TILE_F) * TILE_F
    # +TILE_F extra half-blocks: the kernel's second DMA reads one full
    # aligned row-tile past the last frame tile
    pad = [(0, 0)] * (x.ndim - 1) + [(h, (f_pad + TILE_F) * h - t - h)]
    xp = jnp.pad(x.astype(jnp.float32), pad)
    basis = jnp.asarray(basis, jnp.float32)

    flat = xp.reshape(-1, xp.shape[-1])
    out = _mdct_pallas(flat, basis, f_pad)
    out = out.reshape(*x.shape[:-1], f_pad, basis.shape[1])
    return out[..., :f, :]
