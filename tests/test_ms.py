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
    # ms x blockswitch is supported (SPEC.md §11 x §9) — must NOT raise
    CodecConfig(stereo_mode="ms", n_channels=2, use_block_switch=True)
    with pytest.raises(ValueError, match="even channel"):
        api.encode_array(np.zeros((4096, 1)), PRESETS["stereo44-128-ms"])
    # even multichannel is allowed: adjacent pairs butterfly (SPEC.md §11)
    CodecConfig(stereo_mode="ms", n_channels=4)


@pytest.mark.parametrize("preset", ["stereo44-128-ms", "vbr-ms", "ms-bs",
                                    "vbr-ms-bs"])
def test_ms_corpus_batched_equals_solo(tmp_path, preset):
    """Corpus encode routes ms configs through the joint packed encoders
    (batched bytes == solo bytes), and corpus decode reconstructs L/R."""
    from tac.corpus import CorpusDecoder, CorpusTranscoder
    from tac.io.wav import read_wav, write_wav

    fs = 16000
    cfg = PRESETS[preset].replace(sample_rate=fs, n_mdct_lines=256,
                                  bitrate_bps=64000, n_mdct_lines_short=64)
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


@pytest.fixture(scope="module")
def transient_stereo44():
    """Correlated stereo with a sharp common transient — the ms x
    blockswitch material (SPEC.md §11 x §9)."""
    fs = 44100
    t = np.arange(fs // 4) / fs
    rng = np.random.default_rng(11)
    common = 0.3 * np.sin(2 * np.pi * 440 * t)
    common[len(t) // 2:len(t) // 2 + 500] += 0.5 * np.exp(
        -np.arange(500) / 80.0) * np.sin(
            2 * np.pi * 2800 * np.arange(500) / fs)
    side = (0.04 * np.sin(2 * np.pi * 550 * t)
            + 0.005 * rng.standard_normal(len(t)))
    return np.stack([common + side, common - side], axis=1), fs


@pytest.mark.parametrize("preset", ["ms-bs", "vbr-ms-bs"])
def test_ms_bs_byte_identical(preset, transient_stereo44):
    """M/S x blockswitch (x huffman): joint allocation over the pair's
    state-selected bands at a SHARED window state — byte parity vs the
    serial oracle's joint chain."""
    x, _ = transient_stereo44
    cfg = PRESETS[preset].replace(precision="parity", n_mdct_lines=256,
                                  n_mdct_lines_short=64)
    assert o_enc(x, cfg) == api.encode_array(x, cfg)


@pytest.mark.parametrize("preset", ["ms-bs", "vbr-ms-bs"])
def test_ms_bs_cross_decode(preset, transient_stereo44):
    x, _ = transient_stereo44
    cfg = PRESETS[preset].replace(precision="parity", n_mdct_lines=256,
                                  n_mdct_lines_short=64)
    data = api.encode_array(x, cfg)
    hdr, _ = bs.read_header(data)
    assert hdr.ms and hdr.blockswitch
    y_t = api.decode_array(data)[0]
    y_o = o_dec(data)[0]
    assert _snr(x.ravel(), np.asarray(y_t, np.float64).ravel()) > 10.0
    assert np.max(np.abs(np.asarray(y_t, np.float64)
                         - y_o[: len(y_t)])) < 1e-6


def test_ms_bs_shared_window_state(transient_stereo44):
    """Both channels of a pair carry the SAME 2-bit window state (the
    joint allocation's precondition), and the stream does switch."""
    from tac import bitstream as tbs

    x, _ = transient_stereo44
    cfg = PRESETS["ms-bs"].replace(precision="parity", n_mdct_lines=256,
                                   n_mdct_lines_short=64)
    data = api.encode_array(x, cfg)
    hdr, off = tbs.read_header(data)
    from tac.dsp.mdct import num_frames
    f = num_frames(hdr.num_samples, hdr.n_mdct_lines)
    offs, lens = tbs.split_blocks(data, off, 2 * f)
    states = [data[o] >> 6 for o in offs]   # first 2 bits, MSB-first pack
    pairs = list(zip(states[0::2], states[1::2]))
    assert all(a == b for a, b in pairs)
    assert any(a == 2 for a, _ in pairs)          # SHORT occurs


@pytest.mark.parametrize("preset", ["stereo44-128-ms", "vbr-ms"])
def test_ms_stream_equals_offline(preset, correlated44):
    """Chunked ms streaming == offline bytes (parity, random chunking):
    the butterfly commutes with framing and the joint reservoir rides
    StreamState (SPEC.md §11 streaming contract)."""
    from tac.streaming import StreamEncoder

    x, fs = correlated44
    cfg = PRESETS[preset].replace(precision="parity", sample_rate=fs)
    enc = StreamEncoder(cfg)
    out = [enc.header(len(x))]
    rng = np.random.default_rng(2)
    i = 0
    while i < len(x):
        n = int(rng.integers(1, 2000))
        out.append(enc.push(x[i:i + n]))
        i += n
    out.append(enc.flush())
    assert b"".join(out) == o_enc(x, cfg)


def test_ms_stream_checkpoint_resume(correlated44):
    """Mid-stream StreamState round trip carries the JOINT reservoir."""
    from tac.streaming import StreamEncoder, StreamState

    x, fs = correlated44
    cfg = PRESETS["vbr-ms"].replace(precision="parity", sample_rate=fs)
    cut = len(x) // 2 + 123
    enc = StreamEncoder(cfg)
    part1 = enc.header(len(x)) + enc.push(x[:cut])
    assert enc.state.reservoir.shape == (1,)        # one joint fill
    blob = enc.state.to_bytes()
    enc2 = StreamEncoder(cfg)
    enc2.state = StreamState.from_bytes(blob)
    part2 = enc2.push(x[cut:]) + enc2.flush()
    assert part1 + part2 == api.encode_array(x, cfg)


@pytest.mark.parametrize("preset", ["ms-bs", "vbr-ms-bs"])
def test_ms_bs_stream_equals_offline(preset, transient_stereo44):
    """Chunked ms x blockswitch streaming == offline bytes (parity,
    random chunking): shared pair window state out of the carried flag
    history, joint alloc, joint reservoir in the combo (SPEC.md §11x§9
    streaming contract)."""
    from tac.streaming import StreamEncoder

    x, _ = transient_stereo44
    cfg = PRESETS[preset].replace(precision="parity", n_mdct_lines=256,
                                  n_mdct_lines_short=64)
    enc = StreamEncoder(cfg)
    out = [enc.header(len(x))]
    rng = np.random.default_rng(4)
    i = 0
    while i < len(x):
        n = int(rng.integers(1, 1500))
        out.append(enc.push(x[i:i + n]))
        i += n
    out.append(enc.flush())
    assert b"".join(out) == o_enc(x, cfg)


def test_ms_bs_stream_checkpoint_resume(transient_stereo44):
    """Mid-stream resume of the full combo carries the joint reservoir
    AND the shared pair transient history."""
    from tac.streaming import StreamEncoder, StreamState

    x, _ = transient_stereo44
    cfg = PRESETS["vbr-ms-bs"].replace(precision="parity",
                                       n_mdct_lines=256,
                                       n_mdct_lines_short=64)
    cut = len(x) // 2 + 77
    enc = StreamEncoder(cfg)
    part1 = enc.header(len(x)) + enc.push(x[:cut])
    assert enc.state.reservoir.shape == (1,)
    assert enc.state.t_hist.shape == (1, 2)
    blob = enc.state.to_bytes()
    enc2 = StreamEncoder(cfg)
    enc2.state = StreamState.from_bytes(blob)
    part2 = enc2.push(x[cut:]) + enc2.flush()
    assert part1 + part2 == api.encode_array(x, cfg)


@pytest.mark.parametrize("preset", ["ms-bs", "vbr-ms-bs"])
def test_ms_bs_stream_decode_equals_offline(preset, transient_stereo44):
    """StreamDecoder on ms x blockswitch streams matches decode_array."""
    from tac.streaming import StreamDecoder

    x, _ = transient_stereo44
    cfg = PRESETS[preset].replace(precision="fast", n_mdct_lines=256,
                                  n_mdct_lines_short=64)
    data = api.encode_array(x, cfg)
    y_off, _ = api.decode_array(data, precision="fast")
    dec, off = StreamDecoder.from_header(data)
    rng = np.random.default_rng(6)
    outs, pos = [], off
    while pos < len(data):
        step = int(rng.integers(1, 1200))
        outs.append(dec.push(data[pos:pos + step]))
        pos += step
    y_st = np.concatenate(outs, 0)
    assert y_st.shape == y_off.shape
    np.testing.assert_allclose(y_st, y_off, atol=2e-5)


@pytest.mark.parametrize("preset", ["stereo44-128-ms", "vbr-ms"])
def test_ms_stream_decode_equals_offline(preset, correlated44):
    """StreamDecoder on ms streams: carried overlap tail stays M/S, the
    finalized rows get the inverse butterfly — matches decode_array."""
    from tac.streaming import StreamDecoder

    x, fs = correlated44
    cfg = PRESETS[preset].replace(sample_rate=fs, precision="fast")
    data = api.encode_array(x, cfg)
    y_off, _ = api.decode_array(data, precision="fast")
    dec, off = StreamDecoder.from_header(data)
    rng = np.random.default_rng(3)
    outs, pos = [], off
    while pos < len(data):
        step = int(rng.integers(1, 1500))
        outs.append(dec.push(data[pos:pos + step]))
        pos += step
    y_st = np.concatenate(outs, 0)
    assert y_st.shape == y_off.shape
    np.testing.assert_allclose(y_st, y_off, atol=2e-5)


def test_ms_fast_deterministic(correlated44):
    x, _ = correlated44
    cfg = PRESETS["vbr-ms"]
    assert api.encode_array(x, cfg) == api.encode_array(x, cfg)
