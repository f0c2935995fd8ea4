"""Mid/side joint stereo (SPEC.md §11 — extension beyond the reference).

Covers: byte parity vs the serial oracle (fixed + VBR), the decode
inverse (round trip through the public API), the R-D win that justifies
the mode (ms beats lr on correlated stereo at matched bitrate), header
flag round trip, corrupt-flag rejection, and config validation.
"""

import numpy as np
import pytest

from tac import api, bitstream as bs
from tac.config import PRESETS, CodecConfig
from tac.oracle import decode_array as o_dec, encode_array as o_enc


def _snr(x, y):
    n = min(len(x), len(y))
    x, y = np.asarray(x[:n], np.float64), np.asarray(y[:n], np.float64)
    return 10 * np.log10(np.mean(x ** 2) / max(np.mean((x - y) ** 2), 1e-30))


@pytest.fixture(scope="module")
def correlated44():
    """Correlated stereo: common program + small side component — the
    material class M/S exists for."""
    fs = 44100
    t = np.arange(fs // 2) / fs
    rng = np.random.default_rng(11)
    common = sum(a * np.sin(2 * np.pi * f * t) for a, f in
                 [(0.35, 440), (0.2, 660), (0.1, 1230), (0.05, 3500)])
    side = (0.05 * np.sin(2 * np.pi * 550 * t)
            + 0.01 * rng.standard_normal(len(t)))
    return np.stack([common + side, common - side], axis=1), fs


def test_ms_fixed_byte_identical(correlated44):
    x, _ = correlated44
    cfg = PRESETS["stereo44-128-ms"].replace(precision="parity")
    assert o_enc(x, cfg) == api.encode_array(x, cfg)


def test_ms_vbr_byte_identical(correlated44):
    x, _ = correlated44
    cfg = PRESETS["vbr-ms"].replace(precision="parity")
    assert o_enc(x, cfg) == api.encode_array(x, cfg)


def test_ms_cross_decode(correlated44):
    """tac ms stream → oracle decoder and back; both reconstruct L/R."""
    x, _ = correlated44
    cfg = PRESETS["stereo44-128-ms"].replace(precision="parity")
    data = api.encode_array(x, cfg)
    y_t = api.decode_array(data)[0]
    y_o = o_dec(data)[0]
    assert _snr(x.ravel(), np.asarray(y_t, np.float64).ravel()) > 10.0
    assert np.max(np.abs(np.asarray(y_t, np.float64)
                         - y_o[: len(y_t)])) < 1e-6


def test_ms_beats_lr_fixed(correlated44):
    """The point of the mode: joint allocation on correlated stereo wins
    >= 1 dB at matched bitrate (measured ~+2.7 dB on this material)."""
    x, fs = correlated44
    d_lr = api.encode_array(x, PRESETS["stereo44-128"])
    d_ms = api.encode_array(x, PRESETS["stereo44-128-ms"])
    s_lr = _snr(x.ravel(), api.decode_array(d_lr, "fast")[0].ravel())
    s_ms = _snr(x.ravel(), api.decode_array(d_ms, "fast")[0].ravel())
    # matched rate (ms may only be cheaper — it never pads the budget)
    assert len(d_ms) <= len(d_lr) * 1.01
    assert s_ms >= s_lr + 1.0


def test_ms_beats_lr_vbr(correlated44):
    x, fs = correlated44
    d_lr = api.encode_array(x, PRESETS["vbr-huffman"])
    d_ms = api.encode_array(x, PRESETS["vbr-ms"])
    s_lr = _snr(x.ravel(), api.decode_array(d_lr, "fast")[0].ravel())
    s_ms = _snr(x.ravel(), api.decode_array(d_ms, "fast")[0].ravel())
    assert len(d_ms) <= len(d_lr) * 1.01
    assert s_ms >= s_lr + 1.0


def test_ms_header_flag_roundtrip(correlated44):
    x, _ = correlated44
    data = api.encode_array(x, PRESETS["stereo44-128-ms"])
    hdr, _ = bs.read_header(data)
    assert hdr.ms and hdr.n_channels == 2
    # lr stream leaves the flag clear (format-compatibility invariant)
    hdr2, _ = bs.read_header(api.encode_array(x, PRESETS["stereo44-128"]))
    assert not hdr2.ms


def test_ms_flag_on_mono_rejected():
    """FLAG_MS on a non-stereo header is a corrupt stream."""
    fs = 16000
    x = 0.4 * np.sin(2 * np.pi * 440 * np.arange(fs // 4) / fs)[:, None]
    data = bytearray(api.encode_array(x, PRESETS["mono16-64"]))
    data[6] |= bs.FLAG_MS                  # flags u16 little-endian at off 6
    with pytest.raises(ValueError, match="mid/side"):
        bs.read_header(bytes(data))


def test_ms_config_validation():
    with pytest.raises(ValueError, match="n_channels"):
        CodecConfig(stereo_mode="ms", n_channels=1)
    with pytest.raises(ValueError, match="block switching"):
        CodecConfig(stereo_mode="ms", n_channels=2, use_block_switch=True)
    with pytest.raises(ValueError, match="2-channel"):
        api.encode_array(np.zeros((4096, 1)), PRESETS["stereo44-128-ms"])


@pytest.mark.parametrize("preset", ["stereo44-128-ms", "vbr-ms"])
def test_ms_corpus_batched_equals_solo(tmp_path, preset):
    """Corpus encode routes ms configs through the joint packed encoders
    (batched bytes == solo bytes), and corpus decode reconstructs L/R."""
    from tac.corpus import CorpusDecoder, CorpusTranscoder
    from tac.io.wav import read_wav, write_wav

    fs = 16000
    cfg = PRESETS[preset].replace(sample_rate=fs, n_mdct_lines=256,
                                  bitrate_bps=64000)
    rng = np.random.default_rng(7)
    paths = []
    for i, t_len in enumerate((4000, 9000)):
        t = np.arange(t_len) / fs
        common = 0.4 * np.sin(2 * np.pi * (220 + 80 * i) * t)
        side = 0.03 * np.sin(2 * np.pi * 330 * t) \
            + 0.005 * rng.standard_normal(t_len)
        p = tmp_path / f"clip{i}.wav"
        write_wav(str(p), np.stack([common + side, common - side], 1), fs)
        paths.append(str(p))
    out = tmp_path / "enc"
    stats = CorpusTranscoder(cfg, str(out), batch_size=2).run(
        paths, log=lambda *a: None)
    assert stats["ok"] == 2 and stats["failed"] == 0
    pacs = []
    for p in paths:
        x, _ = read_wav(p)
        name = p.rsplit("/", 1)[1].replace(".wav", ".pac")
        pac = out / name
        assert pac.read_bytes() == api.encode_array(x, cfg), p
        pacs.append(str(pac))
    dec = tmp_path / "dec"
    dstats = CorpusDecoder(str(dec), batch_size=2).run(
        pacs, log=lambda *a: None)
    assert dstats["ok"] == 2 and dstats["failed"] == 0
    for p in paths:
        x, _ = read_wav(p)
        name = p.rsplit("/", 1)[1]
        y, _ = read_wav(str(dec / name))
        assert _snr(x.ravel(), y.ravel()) > 10.0, p


def test_ms_fast_deterministic(correlated44):
    x, _ = correlated44
    cfg = PRESETS["vbr-ms"]
    assert api.encode_array(x, cfg) == api.encode_array(x, cfg)
