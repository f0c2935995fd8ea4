"""Multichannel (beyond stereo) coverage: channels are independent coding
rows everywhere in lr mode (the budget splits per channel, SPEC.md §6),
and the container's channel field is u16 — so 4-channel (quad/ambisonic
B-format-style) streams must round-trip through every surface. In ms
mode adjacent channels butterfly PAIRWISE (SPEC.md §11): any even
channel count runs one joint allocation / reservoir per pair."""

import numpy as np
import pytest

from tac import api
from tac.config import PRESETS


@pytest.fixture(scope="module")
def quad():
    fs = 16000
    t = np.arange(int(fs * 0.4)) / fs
    rng = np.random.default_rng(3)
    chans = [0.4 * np.sin(2 * np.pi * f0 * t) for f0 in (330, 440, 550, 660)]
    x = np.stack(chans, 1) + 0.01 * rng.standard_normal((len(t), 4))
    x[2500:2600, 2] += np.linspace(0, 0.4, 100)          # ch-local transient
    return x


@pytest.mark.parametrize("mode", ["raw", "vbr", "combo"])
def test_quad_round_trip(mode, quad):
    cfg = PRESETS["mono16-64"].replace(
        n_channels=4, bitrate_bps=256_000, n_mdct_lines=256,
        precision="fast",
        use_psy=(mode != "raw"),
        alloc_mode="greedy" if mode != "raw" else "uniform",
        use_huffman=(mode in ("vbr", "combo")),
        use_block_switch=(mode == "combo"),
        n_mdct_lines_short=64 if mode == "combo" else 0)
    x = quad
    data = api.encode_array(x, cfg)
    y, fs = api.decode_array(data, precision="fast")
    assert y.shape == x.shape and fs == 16000
    err = x - y
    snr = 10 * np.log10((x ** 2).sum() / (err ** 2).sum())
    assert snr > 5.0, f"quad {mode} SNR {snr:.1f} dB"
    # per-channel independence: each channel individually intelligible
    for ch in range(4):
        e = x[:, ch] - y[:, ch]
        snr_ch = 10 * np.log10((x[:, ch] ** 2).sum() / (e ** 2).sum())
        assert snr_ch > 3.0, f"ch {ch} SNR {snr_ch:.1f} dB"


def test_quad_stream_equals_offline(quad):
    from tac.streaming import StreamEncoder

    cfg = PRESETS["mono16-64"].replace(
        n_channels=4, bitrate_bps=256_000, n_mdct_lines=256,
        precision="parity")
    x = quad
    enc = StreamEncoder(cfg)
    out = [enc.header(len(x))]
    rng = np.random.default_rng(5)
    i = 0
    while i < len(x):
        n = int(rng.integers(1, 2000))
        out.append(enc.push(x[i:i + n]))
        i += n
    out.append(enc.flush())
    assert b"".join(out) == api.encode_array(x, cfg)


def test_quad_decode_range(quad):
    cfg = PRESETS["mono16-64"].replace(
        n_channels=4, bitrate_bps=256_000, n_mdct_lines=256,
        precision="fast")
    data = api.encode_array(quad, cfg)
    full, _ = api.decode_array(data, precision="fast")
    got, _ = api.decode_range(data, 1000, 3000, precision="fast")
    np.testing.assert_allclose(got, full[1000:3000], atol=2e-5)


# ------------------------------------------------ pairwise mid/side ---------

def _quad_ms_cfg(bs: bool, hf: bool):
    return PRESETS["mono16-64"].replace(
        n_channels=4, bitrate_bps=256_000, n_mdct_lines=256,
        precision="parity", use_psy=True, alloc_mode="greedy",
        stereo_mode="ms", use_huffman=hf, use_block_switch=bs,
        n_mdct_lines_short=64 if bs else 0)


@pytest.fixture(scope="module")
def quad_corr(quad):
    """Quad with correlated pairs (0,1) and (2,3) — the material pairwise
    M/S exists for."""
    x = quad.copy()
    x[:, 1] = 0.9 * x[:, 0] + 0.1 * x[:, 1]
    x[:, 3] = 0.8 * x[:, 2] + 0.2 * x[:, 3]
    return np.clip(x, -0.99, 0.99)


@pytest.mark.parametrize("bs,hf", [(False, False), (False, True),
                                   (True, False), (True, True)])
def test_quad_ms_oracle_parity(bs, hf, quad_corr):
    """4-channel pairwise M/S: device bytes == serial oracle bytes for all
    four families, and the decode round-trips (SPEC.md §11 pairwise)."""
    from tac.oracle import api as oapi

    cfg = _quad_ms_cfg(bs, hf)
    x = quad_corr
    data = api.encode_array(x, cfg)
    assert data == oapi.encode_array(x, cfg)
    y, fs = api.decode_array(data)
    assert y.shape == x.shape and fs == 16000
    snr = 10 * np.log10((x ** 2).sum() / ((x - y) ** 2).sum())
    assert snr > 5.0, f"quad ms bs={bs} hf={hf} SNR {snr:.1f} dB"
    oy, _ = oapi.decode_array(data)
    np.testing.assert_allclose(y, oy[: y.shape[0]], atol=1e-5)


@pytest.mark.parametrize("bs,hf", [(False, True), (True, True)])
def test_quad_ms_stream_equals_offline(bs, hf, quad_corr):
    """Streaming pairwise-M/S encode carries one joint reservoir + one
    shared window state PER PAIR — stream bytes == offline bytes."""
    from tac.streaming import StreamEncoder

    cfg = _quad_ms_cfg(bs, hf)
    x = quad_corr
    enc = StreamEncoder(cfg)
    out = [enc.header(len(x))]
    rng = np.random.default_rng(7)
    i = 0
    while i < len(x):
        n = int(rng.integers(1, 1500))
        out.append(enc.push(x[i:i + n]))
        i += n
    out.append(enc.flush())
    assert b"".join(out) == api.encode_array(x, cfg)


def test_quad_ms_stream_decode_and_range(quad_corr):
    from tac.streaming import StreamDecoder

    cfg = _quad_ms_cfg(False, True)
    data = api.encode_array(quad_corr, cfg)
    full, _ = api.decode_array(data)
    dec, off = StreamDecoder.from_header(data, precision="parity")
    outs = [dec.push(data[off + i: off + i + 997])
            for i in range(0, len(data) - off, 997)]
    y = np.concatenate(outs)
    np.testing.assert_allclose(y, full[: y.shape[0]], atol=1e-5)
    got, _ = api.decode_range(data, 1000, 3000)
    np.testing.assert_allclose(got, full[1000:3000], atol=1e-6)


def test_odd_channels_ms_rejected():
    with pytest.raises(ValueError):
        _quad_ms_cfg(False, False).replace(n_channels=3)
    cfg = _quad_ms_cfg(False, False)
    with pytest.raises(ValueError):
        api.encode_array(np.zeros((600, 3)), cfg)
