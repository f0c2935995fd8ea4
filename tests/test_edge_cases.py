"""Edge cases: malformed streams, WAV format coverage, allocation limits."""

import struct

import numpy as np
import pytest

from tac import api, bands, bitstream as bs
from tac.config import CodecConfig, PRESETS
from tac.io.wav import read_wav, write_wav
from tac.oracle import bitalloc as oba


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        bs.read_header(b"NOPE" + b"\x00" * 64)


def test_bad_version_rejected():
    hdr = bs.PacHeader(sample_rate=44100, n_channels=1, num_samples=10,
                       bitrate_bps=64000, n_mdct_lines=512,
                       n_mdct_lines_short=0, n_scale_bits=4,
                       n_mant_size_bits=4,
                       n_lines_long=np.ones(25, np.int32),
                       n_lines_short=None, huffman=False, blockswitch=False)
    data = bytearray(bs.write_header(hdr))
    struct.pack_into("<H", data, 4, 99)          # corrupt version
    with pytest.raises(ValueError, match="version"):
        bs.read_header(bytes(data))


def test_inflated_length_prefix_rejected():
    """A u16 block length pushed past the header-implied payload capacity
    must raise a clear corrupt-stream error, not an opaque numpy fault."""
    from tac.native import CorruptStreamError

    cfg = PRESETS["mono16-64"]
    x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(4000) / 16000)
    data = bytearray(api.encode_array(x, cfg))
    _, off = bs.read_header(bytes(data))
    struct.pack_into("<H", data, off, 0xFFF0)    # inflate first block length
    with pytest.raises(CorruptStreamError):
        api.decode_array(bytes(data))


def test_truncated_stream_rejected():
    """Cutting a stream mid-payload must raise CorruptStreamError."""
    from tac.native import CorruptStreamError

    cfg = PRESETS["mono16-64"]
    x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(4000) / 16000)
    data = api.encode_array(x, cfg)
    with pytest.raises(CorruptStreamError):
        api.decode_array(data[: len(data) - len(data) // 4])


def test_config_validation():
    with pytest.raises(ValueError):
        CodecConfig(n_mdct_lines=1000)           # not a power of two
    with pytest.raises(ValueError):
        CodecConfig(window="boxcar")
    with pytest.raises(ValueError):
        CodecConfig(use_block_switch=True, n_mdct_lines=256,
                    n_mdct_lines_short=96)       # short must divide long
    # the huffman x block-switch combo is legal since v2 (SPEC.md §8)
    CodecConfig(use_block_switch=True, use_huffman=True,
                n_mdct_lines=256, n_mdct_lines_short=64)


def test_wav_format_coverage(tmp_path, rng):
    """Synthesize non-16-bit WAV bodies and confirm the reader handles
    them (24-bit, 32-bit int, 32-bit float)."""
    fs, t = 8000, 800
    x = np.clip(0.5 * rng.standard_normal(t), -0.99, 0.99)

    def wav_bytes(fmt_tag, bits, body):
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, 1, fs,
                                       fs * bits // 8, bits // 8, bits)
               + b"data" + struct.pack("<I", len(body)))
        return hdr + body

    f32 = wav_bytes(3, 32, x.astype("<f4").tobytes())
    i32 = wav_bytes(1, 32, (x * 2147483648.0).astype("<i4").tobytes())
    i24_vals = np.round(x * 8388608.0).astype(np.int32)
    i24 = wav_bytes(1, 24, b"".join(int(v).to_bytes(3, "little", signed=True)
                                    for v in i24_vals))
    for name, blob, tol in (("f32", f32, 1e-7), ("i32", i32, 1e-8),
                            ("i24", i24, 1e-6)):
        p = tmp_path / f"{name}.wav"
        p.write_bytes(blob)
        y, fs2 = read_wav(str(p))
        assert fs2 == fs and y.shape == (t, 1)
        np.testing.assert_allclose(y[:, 0], x, atol=tol, err_msg=name)


def test_budget_smaller_than_any_band():
    """Budget below the smallest band's line count → all-zero allocation."""
    nl = bands.lines_per_band(44100, 1024)
    a = oba.BitAlloc(int(nl[nl > 0].min()) - 1, 16, bands.N_BANDS, nl,
                     np.zeros(bands.N_BANDS))
    assert a.sum() == 0


def test_tiny_bitrate_roundtrip():
    """Bit-starved config must still produce a decodable stream."""
    fs = 16000
    x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(4096) / fs)
    cfg = PRESETS["mono16-64"].replace(bitrate_bps=8_000)
    y, _ = api.decode_array(api.encode_array(x, cfg))
    assert y.shape == (4096, 1)
    assert np.all(np.isfinite(y))


def test_high_bitrate_high_fidelity():
    fs = 16000
    x = 0.5 * np.sin(2 * np.pi * 440 * np.arange(8192) / fs)
    cfg = PRESETS["mono16-64"].replace(bitrate_bps=512_000)
    y, _ = api.decode_array(api.encode_array(x, cfg))
    err = x - y[: len(x), 0]
    assert 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2)) > 55


def test_dc_and_nyquist_survive():
    fs = 16000
    cfg = PRESETS["mono16-64"]
    dc = np.full(4096, 0.25)
    y, _ = api.decode_array(api.encode_array(dc, cfg))
    assert np.all(np.isfinite(y))
    nyq = 0.25 * np.cos(np.pi * np.arange(4096))
    y, _ = api.decode_array(api.encode_array(nyq, cfg))
    assert np.all(np.isfinite(y))
