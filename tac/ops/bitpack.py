"""Device-side MSB-first bit packing (the TPU replacement for host packing).

The reference packs bit-by-bit in Python (its #1 hot loop, SURVEY.md §3.1);
tac.bitstream packs vectorized on host. This module moves packing ONTO the
TPU so only the true payload bytes cross the device→host link (the encode
pipeline's only large transfer — measured dominant over the remote-TPU
tunnel, and flaky for multi-MB transfers).

Scheme: GATHER-based — scatters serialize on TPU (measured: two
scatter-add fusions were 56% of the whole encode graph). Instead of
scattering each field into the word buffer, every OUTPUT bit position p
binary-searches (searchsorted over the width cumsum) which field covers it
and gathers that bit; 32 bit lanes then reduce into each word. Everything
is take_along_axis + elementwise — fully parallel over [rows, cap_bits].
Bit order: stream bit p = bit (31 - p%32) of word p//32, i.e. big-endian
within a word — byte-compatible with tac.bitstream.pack_fields (verified
bit-exact in tests/test_device_pack.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _use_pallas_pack(n_rows: int) -> bool:
    """Gate for the Pallas scatter kernel (tac/ops/pallas_pack.py): TPU
    backend, enough rows to fill the [8, 128] tile once. TAC_PALLAS_PACK=0
    disables — read at TRACE time like the other kernel gates."""
    import os

    if os.environ.get("TAC_PALLAS_PACK") == "0" or n_rows < 64:
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pack_rows(vals, wids, cap_bits: int):
    """Pack fields MSB-first per row, on device.

    vals: int32[..., NF] field values (< 2^width, width ≤ 16);
    wids: int32[..., NF] field widths (0 = absent);
    cap_bits: static per-row capacity (rounded up to a word multiple).

    Returns (words uint32[..., W32], nbits int32[...]) where the packed
    stream of row r is the big-endian byte view of words[r, :ceil(nbits/32)].
    """
    w32 = -(-cap_bits // 32)
    vals = jnp.asarray(vals, jnp.uint32)
    wids_ = jnp.asarray(wids, jnp.int32)
    lead = vals.shape[:-1]
    nf = vals.shape[-1]
    v = vals.reshape(-1, nf)
    wd = wids_.reshape(-1, nf)

    end = jnp.cumsum(wd, axis=-1)                        # [R, NF] field ends
    nbits = end[:, -1]
    start = end - wd
    word0 = start >> 5                                   # first word touched
    r = (start & 31).astype(jnp.uint32)                  # MSB-first offset
    w = wd.astype(jnp.uint32)
    n0 = jnp.minimum(r + w, 32) - r                      # bits in word0
    n1 = w - n0                                          # spill into word0+1
    c0 = jnp.where(wd > 0, (v >> (w - n0)) << (32 - r - n0), jnp.uint32(0))
    c1 = jnp.where(n1 > 0,
                   (v & ((jnp.uint32(1) << n1) - 1)) << (32 - n1),
                   jnp.uint32(0))
    # word0 is NON-DECREASING along the field axis (cumsum order), so the
    # scatter is a sorted segment-OR: fields never share bits within a
    # word, so the integer sum equals bitwise OR. On TPU it runs as a
    # Pallas kernel with register-resident word accumulators (measured
    # 87% of the device encode as the XLA reduce below — PERF.md).
    if _use_pallas_pack(v.shape[0]):
        from tac.ops.pallas_pack import scatter_words_rows

        words = scatter_words_rows(c0, c1, word0, w32=w32)
        return words.reshape(*lead, w32), nbits.reshape(lead)
    wi = jnp.arange(w32, dtype=jnp.int32)                # [W32]
    words = (
        jnp.sum(jnp.where(word0[:, :, None] == wi, c0[:, :, None],
                          jnp.uint32(0)), axis=1, dtype=jnp.uint32)
        + jnp.sum(jnp.where(word0[:, :, None] == wi - 1, c1[:, :, None],
                            jnp.uint32(0)), axis=1, dtype=jnp.uint32))
    return words.reshape(*lead, w32), nbits.reshape(lead)


def _check_capacity(words: np.ndarray, nbits: np.ndarray) -> None:
    """Fail loudly if any row's packed bits exceed its word capacity.

    pack_rows scatters with mode="drop", so a field-layout change that
    overruns cap_bits would otherwise corrupt the stream silently; this is
    the host boundary where the bytes materialize, so it is the one place
    the check costs nothing on device."""
    cap = 32 * words.shape[-1]
    nb = np.asarray(nbits)
    if nb.size and int(nb.max()) > cap:
        raise ValueError(
            f"packed payload overflow: row needs {int(nb.max())} bits but "
            f"capacity is {cap} — field layout and capacity_bits drifted")


def rows_to_bytes(words: np.ndarray, nbits: np.ndarray) -> list[bytes]:
    """Host finalization: big-endian byte view, trimmed to ceil(nbits/8)."""
    words = np.asarray(words)
    _check_capacity(words, nbits)
    flat = words.reshape(-1, words.shape[-1]).astype(">u4", order="C") \
        .view(np.uint8)
    nbytes = -(-np.asarray(nbits).reshape(-1) // 8)
    return [flat[i, : nbytes[i]].tobytes() for i in range(flat.shape[0])]


def stream_to_rows(data: bytes, offsets: np.ndarray, lens: np.ndarray,
                   w32: int) -> np.ndarray:
    """Host staging for device-side unpack: gather each u16-prefixed payload
    into a zero-padded [K, W32] uint32 (big-endian bit order) row buffer.
    Vectorized (one scatter over all payload bytes).

    Rejects payloads longer than the config-implied capacity with a clear
    corrupt-stream error (an inflated u16 length prefix would otherwise
    surface as an opaque scatter IndexError)."""
    from tac.native import CorruptStreamError

    cap = 4 * w32
    if len(lens) and int(np.max(lens)) > cap:
        raise CorruptStreamError(
            f"block payload of {int(np.max(lens))} bytes exceeds the "
            f"{cap}-byte capacity implied by the stream header — "
            f"corrupt length prefix or header")
    buf = np.frombuffer(data, np.uint8)
    k = len(offsets)
    out = np.zeros((k, 4 * w32), np.uint8)
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    fid = np.repeat(np.arange(k), lens)
    pos = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(lens) - lens, lens)
    out[fid, pos] = buf[np.asarray(offsets, np.int64)[fid] + pos]
    return out.view(">u4").astype(np.uint32)


def rows_to_stream(words: np.ndarray, nbits: np.ndarray) -> bytes:
    """Host finalization into the PAC-T block stream: u16 length prefix per
    row + payload bytes, rows in storage order (vectorized, no per-row
    Python loop on the hot path)."""
    words = np.asarray(words)
    _check_capacity(words, nbits)
    k = int(np.prod(words.shape[:-1]))
    flat = words.reshape(k, words.shape[-1]).astype(">u4", order="C") \
        .view(np.uint8)
    nbytes = (-(-np.asarray(nbits).reshape(k) // 8)).astype(np.int64)
    total = int(nbytes.sum()) + 2 * k
    out = np.empty(total, np.uint8)
    dst_end = np.cumsum(nbytes + 2)
    dst_start = dst_end - nbytes
    le = nbytes.astype("<u2").view(np.uint8).reshape(-1, 2)
    out[dst_start - 2] = le[:, 0]
    out[dst_start - 1] = le[:, 1]
    fid = np.repeat(np.arange(k), nbytes)
    pos = np.arange(int(nbytes.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(nbytes) - nbytes, nbytes)
    out[dst_start[fid] + pos] = flat[fid, pos]
    return out.tobytes()
