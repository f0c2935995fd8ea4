"""Parity across the wider config matrix: windows, allocation modes,
sample rates, block sizes — byte-identical oracle↔JAX streams everywhere
the SPEC requires (SPEC.md §10)."""

import numpy as np
import pytest

from tac import api
from tac.config import CodecConfig
from tac.oracle import encode_array as o_enc


@pytest.fixture(scope="module")
def clip():
    def make(fs):
        t = np.arange(fs // 3) / fs
        rng = np.random.default_rng(9)
        x = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.15 * np.sin(2 * np.pi * 1870 * t)
             + 0.01 * rng.standard_normal(len(t)))
        return x[:, None]
    return make


@pytest.mark.parametrize("kw", [
    dict(window="kbd"),
    dict(window="hann"),
    dict(alloc_mode="const_snr", use_psy=False),
    dict(alloc_mode="const_mnr"),
    dict(n_mdct_lines=512),
    dict(n_mdct_lines=2048),
    dict(sample_rate=48000),
    dict(sample_rate=32000),
    dict(n_scale_bits=3, n_mant_size_bits=4),
])
def test_byte_parity(kw, clip):
    fs = kw.pop("sample_rate", 44100)
    cfg = CodecConfig(sample_rate=fs, n_channels=1, bitrate_bps=96_000,
                      precision="parity", **kw)
    x = clip(fs)
    d_t = api.encode_array(x, cfg)
    d_o = o_enc(x, cfg)
    assert d_t == d_o, f"parity broken for {kw}"
    y, fs2 = api.decode_array(d_t)
    assert fs2 == fs and y.shape[0] == x.shape[0]


def test_oracle_file_lifecycle(tmp_path, clip):
    """The oracle's reference-style PACFile/WAVFile block-loop path."""
    from tac.io.wav import read_wav, write_wav
    from tac.oracle import decode as o_dec_file, encode as o_enc_file

    fs = 16000
    x = clip(fs)
    wav = tmp_path / "in.wav"
    write_wav(str(wav), x, fs)
    cfg = CodecConfig(sample_rate=fs, n_channels=1, bitrate_bps=64_000,
                      n_mdct_lines=512, precision="parity")
    pac = tmp_path / "o.pac"
    out = tmp_path / "o.wav"
    o_enc_file(str(wav), str(pac), cfg)
    o_dec_file(str(pac), str(out))
    y, fs2 = read_wav(str(out))
    assert fs2 == fs
    # file-based oracle stream == tac array-based stream (same 16-bit
    # quantized input)
    xq, _ = read_wav(str(wav))
    assert pac.read_bytes() == api.encode_array(xq, cfg)
