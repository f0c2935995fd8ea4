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
(read as uint32; the lo term vanishes when p&31 == 0). Pure gathers — no
scatter, no loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def read_fields(words, offsets, widths):
    """Gather MSB-first fields from per-row word buffers.

    words:   uint32[..., W32]  (big-endian bit order, as packed)
    offsets: int32[..., NF]    absolute bit offsets within the row
    widths:  int32[..., NF]    field widths (0 → 0)

    Returns int32[..., NF]. Fully vectorized; offsets may be any order.
    """
    w32 = words.shape[-1]
    word0 = (offsets >> 5).astype(jnp.int32)
    r = (offsets & 31).astype(jnp.uint32)
    hi = jnp.take_along_axis(words, jnp.clip(word0, 0, w32 - 1), axis=-1)
    lo = jnp.take_along_axis(words, jnp.clip(word0 + 1, 0, w32 - 1), axis=-1)
    # (hi << r) | (lo >> (32 - r)); guard the undefined >>32 when r == 0
    merged = (hi << r) | jnp.where(r > 0, lo >> (32 - r), 0)
    w = jnp.asarray(widths, jnp.uint32)
    vals = jnp.where(w > 0, merged >> (32 - w), 0)
    return vals.astype(jnp.int32)
