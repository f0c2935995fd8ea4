"""Device-side decode for VBR and block-switch streams (decode mirror of
the packed encode paths): exact equality against the host deserializer
route, plus untrusted-input framing checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from tac import api, bands, bitstream as bs, codec, native
from tac.config import PRESETS
from tac.ops import bitpack as dbp


def _clip(fs, seconds=1.0, ch=2):
    t = np.arange(int(fs * seconds)) / fs
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1661 * t)
    x[len(t) // 3:len(t) // 3 + 400] += 0.5 * np.exp(-np.arange(400) / 60.0)
    rng = np.random.default_rng(7)
    cols = [x * (0.9 ** i) + 0.01 * rng.standard_normal(len(t))
            for i in range(ch)]
    return np.stack(cols, axis=1)


def _stage(data, off, f, c, w32):
    offs, lens = bs.split_blocks(data, off, f * c)
    rows = dbp.stream_to_rows(data, offs, lens, w32)
    return jnp.asarray(np.ascontiguousarray(
        rows.reshape(f, c, w32).swapaxes(0, 1)))


def test_vbr_device_decode_equals_host():
    """The device VBR unpack (huffman decode scan) must reproduce the host
    deserializer INTEGER-for-integer — the format contract — and the fused
    audio to f64 rounding (different graph shapes may differ by ulps in
    the FFT, so float equality across graphs is not a valid contract)."""
    cfg = PRESETS["vbr-huffman"].replace(precision="parity")
    x = _clip(cfg.sample_rate)
    data = api.encode_array(x, cfg)
    hdr, off = bs.read_header(data)
    from tac.dsp.mdct import num_frames
    dcfg = cfg.replace(use_psy=False)
    f = num_frames(hdr.num_samples, cfg.n_mdct_lines)

    host = codec.FrameCode(*[
        np.asarray(l).reshape(cfg.n_channels * f, *l.shape[2:])
        for l in api.payload_to_frames_vbr(data, off, f, dcfg,
                                           cfg.n_mdct_lines)])

    w32 = -(-codec.payload_capacity_bits(dcfg) // 32)
    words = _stage(data, off, f, cfg.n_channels, w32)
    dev = codec._unpack_vbr_fields(words.reshape(-1, w32), dcfg,
                                   codec.make_consts(dcfg))
    for name, a, b in zip(host._fields, dev, host):
        np.testing.assert_array_equal(np.asarray(a), b, err_msg=name)

    code = api.payload_to_frames_vbr(data, off, f, dcfg, cfg.n_mdct_lines)
    y_host = np.asarray(codec.decode_clip(code, dcfg, hdr.num_samples))
    y_dev = np.asarray(codec.decode_clip_vbr_packed(words, dcfg,
                                                    hdr.num_samples))
    np.testing.assert_allclose(y_dev, y_host, atol=1e-12, rtol=0)
    # the stream really must contain huffman-coded rows for this to count
    assert int(np.asarray(codec.encode_clip_vbr(
        jnp.asarray(x.T), cfg).table_id).sum()) > 0


def test_bs_device_decode_equals_host():
    cfg = PRESETS["streaming-ll"].replace(precision="parity", n_channels=2)
    x = _clip(cfg.sample_rate)
    data = api.encode_array(x, cfg)
    hdr, off = bs.read_header(data)
    from tac import blockswitch as bsw
    from tac.dsp.mdct import num_frames
    dcfg = cfg.replace(use_psy=False)
    f = num_frames(hdr.num_samples, cfg.n_mdct_lines)

    bc = bsw.payload_to_frames_bs(data, off, f, dcfg)
    flat = lambda l: np.asarray(l).reshape(
        cfg.n_channels * f, *np.asarray(l).shape[2:])

    w32 = -(-bsw.capacity_bits_bs(dcfg, bsw.make_bs_consts(dcfg)) // 32)
    words = _stage(data, off, f, cfg.n_channels, w32)
    dev = bsw._unpack_bs_fields(words.reshape(-1, w32), dcfg,
                                bsw.make_bs_consts(dcfg))
    np.testing.assert_array_equal(np.asarray(dev.state), flat(bc.state))
    for name, a, b in zip(dev.long._fields, dev.long, bc.long):
        np.testing.assert_array_equal(np.asarray(a), flat(b), err_msg=name)

    y_host = np.asarray(bsw.decode_clip_bs(bc, dcfg, hdr.num_samples))
    y_dev = np.asarray(bsw.decode_clip_bs_packed(words, dcfg,
                                                 hdr.num_samples))
    np.testing.assert_allclose(y_dev, y_host, atol=1e-12, rtol=0)
    assert int(np.asarray(bc.state).max()) > 0   # stream has non-LONG states


@pytest.mark.parametrize("preset", ["stereo44-128", "vbr-huffman",
                                    "streaming-ll"])
def test_truncated_container_raises(preset):
    cfg = PRESETS[preset]
    x = _clip(cfg.sample_rate, seconds=0.3, ch=cfg.n_channels)
    data = api.encode_array(x, cfg)
    with pytest.raises(native.CorruptStreamError):
        api.decode_array(data[: int(len(data) * 0.6)])