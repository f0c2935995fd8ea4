"""LUT-free canonical-Huffman decode kernel (tac/ops/pallas_huffdec.py):
line-exact equality vs the XLA decode scan on real encoded streams
(interpret mode on the CPU suite; the compiled kernel is byte-parity
covered on-chip by the device decode suites and measured in
tools/bench_decode.py)."""

import numpy as np
import jax.numpy as jnp

from tac import bands, codec
from tac.config import PRESETS
from tac.ops.pallas_huffdec import huffman_decode_rows

CFG = PRESETS["vbr-huffman"]


def _stream_rows(rng, secs=0.4):
    """Encode a clip and return its staged payload rows + decode fields."""
    fs = CFG.sample_rate
    t = np.arange(int(fs * secs)) / fs
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 2333 * t)
           + 0.05 * rng.standard_normal(len(t)))
    x = jnp.asarray(np.stack([sig, 0.8 * sig]), jnp.float32)
    words, nbits = codec.encode_clip_vbr_packed(x, CFG)
    wf = jnp.asarray(np.asarray(words)).reshape(-1, words.shape[-1])
    return wf


def test_kernel_equals_scan(rng):
    wf = _stream_rows(rng)
    c = codec.make_consts(CFG)
    s, a = CFG.n_scale_bits, CFG.n_mant_size_bits
    nb = bands.N_BANDS
    from tac.ops.bitunpack import read_fields

    k = wf.shape[0]
    head_off = jnp.concatenate([
        jnp.asarray([0, s], jnp.int32),
        s + 2 + a * jnp.arange(nb, dtype=jnp.int32)])
    head_wid = jnp.concatenate([jnp.asarray([s, 2], jnp.int32),
                                jnp.full(nb, a, jnp.int32)])
    head = read_fields(wf, jnp.broadcast_to(head_off, (k, nb + 2)),
                       jnp.broadcast_to(head_wid, (k, nb + 2)))
    alloc = codec.ba.code_to_alloc(head[:, 2:])
    sf_w = jnp.where(alloc > 0, s, 0).astype(jnp.int32)
    sf_end = jnp.cumsum(sf_w, axis=1)
    m_line = alloc[:, c.band_of_line].astype(jnp.int32)
    mant_start = (s + 2 + a * nb) + sf_end[:, -1]

    ref = np.asarray(codec._huffman_decode_scan(wf, mant_start, m_line))
    out = np.asarray(huffman_decode_rows(wf, mant_start, m_line,
                                         interpret=True))
    # compare on huffman rows only (tid == 1); raw rows' walks are
    # discarded garbage in both paths but share valid-stream semantics
    tid = np.asarray(head[:, 1])
    hufr = tid == 1
    assert hufr.any(), "test stream has no huffman rows"
    np.testing.assert_array_equal(ref[hufr], out[hufr])


def test_kernel_equals_scan_set2(rng):
    """tid=2 rows (SPEC §8 v3): the kernel's set-2 canonical constants
    decode identically to the XLA scan with the set-2 LUTs on a real
    transient stream."""
    from tools.material import castanets

    fs = CFG.sample_rate
    x = jnp.asarray(castanets(fs, 0.6)[None, :], jnp.float32)
    cfg = CFG.replace(n_channels=1)
    words, nbits = codec.encode_clip_vbr_packed(x, cfg)
    wf = jnp.asarray(np.asarray(words)).reshape(-1, words.shape[-1])
    c = codec.make_consts(cfg)
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    nb = bands.N_BANDS
    from tac.ops.bitunpack import read_fields

    k = wf.shape[0]
    head_off = jnp.concatenate([
        jnp.asarray([0, s], jnp.int32),
        s + 2 + a * jnp.arange(nb, dtype=jnp.int32)])
    head_wid = jnp.concatenate([jnp.asarray([s, 2], jnp.int32),
                                jnp.full(nb, a, jnp.int32)])
    head = read_fields(wf, jnp.broadcast_to(head_off, (k, nb + 2)),
                       jnp.broadcast_to(head_wid, (k, nb + 2)))
    alloc = codec.ba.code_to_alloc(head[:, 2:])
    sf_w = jnp.where(alloc > 0, s, 0).astype(jnp.int32)
    sf_end = jnp.cumsum(sf_w, axis=1)
    m_line = alloc[:, c.band_of_line].astype(jnp.int32)
    mant_start = (s + 2 + a * nb) + sf_end[:, -1]

    tid = np.asarray(head[:, 1])
    assert (tid == 2).any(), "transient stream has no tid=2 rows"
    ref = np.asarray(codec._huffman_decode_scan(wf, mant_start, m_line,
                                                set_id=2))
    out = np.asarray(huffman_decode_rows(wf, mant_start, m_line,
                                         interpret=True, set_id=2))
    sel = tid == 2
    np.testing.assert_array_equal(ref[sel], out[sel])
