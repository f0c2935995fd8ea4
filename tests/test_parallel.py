"""Mesh/shard_map tests on the virtual 8-device CPU mesh (SURVEY.md §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tac import api, codec, parallel
from tac.config import CodecConfig

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = CodecConfig(sample_rate=16000, n_channels=1, bitrate_bps=64000,
                  n_mdct_lines=128, use_psy=True, precision="fast")


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b, c, t = 8, 1, 4096
    tt = np.arange(t) / CFG.sample_rate
    x = np.stack([0.3 * np.sin(2 * np.pi * (200 + 50 * i) * tt)[None, :]
                  + 0.01 * rng.standard_normal((c, t)) for i in range(b)])
    return jnp.asarray(x, jnp.float32)


def test_sharded_encode_matches_single_device(batch):
    mesh = parallel.make_mesh(n_clips=8, n_frames=1)
    code_s = parallel.encode_batch_sharded(
        parallel.shard_clips(batch, mesh), CFG, mesh)
    code_1 = parallel.encode_batch(batch, CFG)
    for a, b in zip(code_s, code_1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_decode_halo_matches_serial(batch):
    """2D mesh: 4-way clips DP x 2-way frames SP with ppermute halo."""
    t = batch.shape[-1]
    code = parallel.encode_batch(batch, CFG)
    mesh = parallel.make_mesh(n_clips=4, n_frames=2)
    y_s = parallel.decode_batch_sharded(code, CFG, t, mesh)
    y_1 = jax.vmap(lambda c: codec._decode_clip_impl(c, CFG, t))(code)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_1),
                               atol=1e-6)


def test_corpus_metrics_psum(batch):
    mesh = parallel.make_mesh(n_clips=8, n_frames=1)
    t = batch.shape[-1]
    code = parallel.encode_batch(batch, CFG)
    y = jax.vmap(lambda c: codec._decode_clip_impl(c, CFG, t))(code)
    mean, snrs = parallel.corpus_metrics_sharded(
        parallel.shard_clips(batch, mesh), parallel.shard_clips(y, mesh),
        mesh)
    assert np.asarray(snrs).shape == (8,)
    np.testing.assert_allclose(float(mean), float(np.mean(np.asarray(snrs))),
                               rtol=1e-6)
    assert float(mean) > 5.0


def test_sharded_packed_encode_matches_single(batch):
    """Device-packed encode sharded over clips == single-device words."""
    mesh = parallel.make_mesh(n_clips=8, n_frames=1)
    w_s, n_s = parallel.encode_batch_packed_sharded(
        parallel.shard_clips(batch, mesh), CFG, mesh)
    w_1, n_1 = parallel.encode_batch_packed(batch, CFG)
    np.testing.assert_array_equal(np.asarray(w_s), np.asarray(w_1))
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_1))


def test_sharded_roundtrip_bytes_match_api(batch):
    """Sharded encode → host serialize must equal the single-path bytes."""
    mesh = parallel.make_mesh(n_clips=8, n_frames=1)
    code_s = parallel.encode_batch_sharded(
        parallel.shard_clips(batch, mesh), CFG, mesh)
    x0 = np.asarray(batch[0, 0])
    d_single = api.encode_array(x0, CFG)
    from tac import bands
    h = CFG.n_mdct_lines
    n_lines = bands.lines_per_band(CFG.sample_rate, h)
    code0 = codec.FrameCode(*[np.asarray(l)[0] for l in code_s])
    payload = api.frames_to_payload(code0, CFG, h, n_lines)
    assert payload == d_single[len(d_single) - len(payload):]


def _stage_words(data, cfg):
    from tac import bitstream as bs
    from tac.dsp.mdct import num_frames
    from tac.ops import bitpack as dbp
    hdr, off = bs.read_header(data)
    dcfg = cfg.replace(use_psy=False)
    f = num_frames(hdr.num_samples, cfg.n_mdct_lines)
    c = cfg.n_channels
    w32 = -(-codec.payload_capacity_bits(dcfg) // 32)
    offs, lens = bs.split_blocks(data, off, f * c)
    rows = dbp.stream_to_rows(data, offs, lens, w32)
    return (np.ascontiguousarray(rows.reshape(f, c, w32).swapaxes(0, 1)),
            dcfg, hdr.num_samples)


@pytest.mark.parametrize("huffman", [False, True])
def test_batched_packed_decode_matches_per_clip(batch, huffman):
    """decode_batch_packed([B,C,F,W32]) == per-clip decode_array, bit-for-
    bit on the staged words and sample-exact on the PCM (same graph shape
    per row, so float equality holds across the batch dim)."""
    cfg = CFG.replace(use_huffman=huffman)
    ws, refs = [], []
    for i in range(batch.shape[0]):
        data = api.encode_array(np.asarray(batch[i]).T, cfg)
        w, dcfg, t = _stage_words(data, cfg)
        ws.append(w)
        y, _ = api.decode_array(data, precision="fast")
        refs.append(y.T)
    words = jnp.asarray(np.stack(ws))
    y_b = np.asarray(parallel.decode_batch_packed(words, dcfg, t,
                                                  huffman=huffman))
    np.testing.assert_array_equal(y_b.astype(np.float32), np.stack(refs))

    mesh = parallel.make_mesh(n_clips=8, n_frames=1)
    y_s = np.asarray(parallel.decode_batch_packed_sharded(
        jnp.asarray(words), dcfg, t, mesh, huffman=huffman))
    np.testing.assert_array_equal(y_s, y_b)
