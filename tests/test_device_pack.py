"""Device bit-packer tests: bit-exact vs the host packer (SPEC.md §7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tac import api, bands, bitstream as bs, codec
from tac.config import PRESETS
from tac.ops import bitpack as dbp


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_rows_matches_host_packer(seed):
    rng = np.random.default_rng(seed)
    k, nf = 10, 200
    wids = rng.integers(0, 17, (k, nf))
    vals = np.array([[rng.integers(0, 1 << w) if w else 0 for w in row]
                     for row in wids])
    words, nbits = dbp.pack_rows(jnp.asarray(vals, jnp.int32),
                                 jnp.asarray(wids, jnp.int32),
                                 cap_bits=int(wids.sum(1).max()) + 32)
    blobs = dbp.rows_to_bytes(np.asarray(words), np.asarray(nbits))
    for i in range(k):
        expect = bs.pack_fields(vals[i].astype(np.uint64), wids[i])
        assert np.asarray(nbits)[i] == wids[i].sum()
        np.testing.assert_array_equal(
            np.frombuffer(blobs[i], np.uint8), expect)


@pytest.mark.parametrize("shape", [(3, 7, 64), (130, 1075, 1518),
                                   (1025, 300, 587), (64, 40, 6638)])
def test_pallas_pack_kernel_matches_xla_reduce(shape):
    """scatter_words_rows (interpret mode) == the XLA compare-reduce,
    word for word, across every stream family's (R, NF, cap) shape."""
    from tac.ops.pallas_pack import scatter_words_rows

    r, nf, cap = shape
    rng = np.random.default_rng(r + nf)
    wids = rng.integers(0, 17, (r, nf))
    wids[rng.random((r, nf)) < 0.5] = 0
    vals = rng.integers(0, 1 << 16, (r, nf)) & ((1 << np.maximum(wids, 1))
                                                - 1)
    vals[wids == 0] = 0
    w32 = -(-cap // 32)
    v = jnp.asarray(vals, jnp.uint32)
    wd = jnp.asarray(wids, jnp.int32)
    end = jnp.cumsum(wd, axis=-1)
    start = end - wd
    word0 = start >> 5
    rr = (start & 31).astype(jnp.uint32)
    w = wd.astype(jnp.uint32)
    n0 = jnp.minimum(rr + w, 32) - rr
    n1 = w - n0
    c0 = jnp.where(wd > 0, (v >> (w - n0)) << (32 - rr - n0),
                   jnp.uint32(0))
    c1 = jnp.where(n1 > 0, (v & ((jnp.uint32(1) << n1) - 1)) << (32 - n1),
                   jnp.uint32(0))
    got = scatter_words_rows(c0, c1, word0, w32=w32, interpret=True)
    wi = jnp.arange(w32, dtype=jnp.int32)
    want = (jnp.sum(jnp.where(word0[:, :, None] == wi, c0[:, :, None],
                              jnp.uint32(0)), axis=1, dtype=jnp.uint32)
            + jnp.sum(jnp.where(word0[:, :, None] == wi - 1,
                                c1[:, :, None], jnp.uint32(0)),
                      axis=1, dtype=jnp.uint32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_encode_bytes_identical_to_host_path():
    """Full clip: device-packed stream == host-packed stream, byte for byte."""
    fs = 16000
    rng = np.random.default_rng(3)
    t = np.arange(fs) / fs
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * np.sin(2 * np.pi * 3000 * t)
         + 0.01 * rng.standard_normal(fs))
    cfg = PRESETS["mono16-64"]
    h = cfg.n_mdct_lines
    n_lines = bands.lines_per_band(cfg.sample_rate, h)

    code = codec.encode_clip(jnp.asarray(x[None, :]), cfg)
    host = api.frames_to_payload(code, cfg, h, n_lines)

    words, nbits = codec.encode_clip_packed(jnp.asarray(x[None, :]), cfg)
    dev = dbp.rows_to_stream(np.asarray(words).swapaxes(0, 1),
                             np.asarray(nbits).swapaxes(0, 1))
    assert dev == host


def test_encode_array_uses_device_pack_and_decodes():
    fs = 44100
    t = np.arange(fs // 4) / fs
    x = np.stack([0.4 * np.sin(2 * np.pi * 440 * t),
                  0.4 * np.sin(2 * np.pi * 660 * t)], 1)
    cfg = PRESETS["stereo44-128"]
    data = api.encode_array(x, cfg)
    y, fs2 = api.decode_array(data)
    assert fs2 == fs and y.shape == x.shape
    err = x - y
    assert 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2)) > 15
