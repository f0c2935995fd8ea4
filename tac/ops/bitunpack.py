"""Device-side MSB-first bit UNPACKING (decode mirror of tac.ops.bitpack).

Measured motivation: host-side deserialization forces the decoder to
upload full [C, F, H] mantissa arrays to the device (~20x the bitstream
size) — on this box's link that made decode ~100x slower than encode.
With on-device unpacking only the payload words go up (~the bitstream
itself) and the whole decode (unpack → dequantize → IMDCT → overlap-add)
is one fused graph.

Every field is ≤ 16 < 32 bits, so it spans at most two adjacent 32-bit
big-endian words: a field at bit offset p with width w is
    v = ((hi << (p&31)) | (lo >> (32 - p&31)))  >>  (32 - w)
(read as uint32; the lo term vanishes when p&31 == 0).

The hi/lo word fetch is a SELECT-ACCUMULATE over the static word axis,
not a gather: TPU gathers lower to per-element loops and were 94% of
decode device time (two take_along_axis over [K, H] from [K, W32]); an
unrolled `where(word0 == w, words[w], acc)` chain is one fused
elementwise kernel — measured ~40x cheaper. Out-of-range offsets read 0
(the gather version clamped to the last word; both only occur masked or
on corrupt input — the host framing layer rejects inflated prefixes).
"""

from __future__ import annotations

import jax.numpy as jnp


def read_fields(words, offsets, widths):
    """Read MSB-first fields from per-row word buffers.

    words:   uint32[..., W32]  (big-endian bit order, as packed)
    offsets: int32[..., NF]    absolute bit offsets within the row
    widths:  int32[..., NF]    field widths (0 → 0)

    Returns int32[..., NF]. Fully vectorized; offsets may be any order.
    """
    w32 = words.shape[-1]
    word0 = (offsets >> 5).astype(jnp.int32)
    r = (offsets & 31).astype(jnp.uint32)
    hi = jnp.zeros(offsets.shape, jnp.uint32)
    lo = jnp.zeros(offsets.shape, jnp.uint32)
    for w in range(w32):                       # static unroll, fuses flat
        cur = words[..., w:w + 1].astype(jnp.uint32)
        hi = jnp.where(word0 == w, cur, hi)
        lo = jnp.where(word0 == w - 1, cur, lo)
    # (hi << r) | (lo >> (32 - r)); guard the undefined >>32 when r == 0
    merged = (hi << r) | jnp.where(r > 0, lo >> (32 - r), 0)
    w = jnp.asarray(widths, jnp.uint32)
    vals = jnp.where(w > 0, merged >> (32 - w), 0)
    return vals.astype(jnp.int32)
