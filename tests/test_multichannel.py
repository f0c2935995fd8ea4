"""Multichannel (beyond stereo) coverage: channels are independent coding
rows everywhere in lr mode (the budget splits per channel, SPEC.md §6),
and the container's channel field is u16 — so 4-channel (quad/ambisonic
B-format-style) streams must round-trip through every surface that
doesn't require a pair (ms is validated to n_channels=2)."""

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
