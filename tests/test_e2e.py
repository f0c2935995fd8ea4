"""End-to-end file/CLI tests (SURVEY.md §4 item 3: WAV→PAC→WAV per config)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from tac import api
from tac.config import PRESETS
from tac.io.wav import read_wav, write_wav


def _snr(x, y):
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    return 10 * np.log10(np.mean(x ** 2) / max(np.mean((x - y) ** 2), 1e-30))


@pytest.fixture()
def wav_file(tmp_path):
    fs = 44100
    t = np.arange(fs) / fs
    x = np.stack([0.4 * np.sin(2 * np.pi * 440 * t),
                  0.4 * np.sin(2 * np.pi * 660 * t)], 1)
    p = tmp_path / "in.wav"
    write_wav(str(p), x, fs)
    return p, x, fs


def test_file_roundtrip(wav_file, tmp_path):
    p, x, fs = wav_file
    pac = tmp_path / "out.pac"
    out = tmp_path / "out.wav"
    stats = api.encode(str(p), str(pac), PRESETS["stereo44-128"])
    assert 100 < stats["kbps"] < 160
    api.decode(str(pac), str(out))
    y, fs2 = read_wav(str(out))
    assert fs2 == fs and y.shape[0] == x.shape[0]
    assert _snr(x[:, 0], y[:, 0]) > 15


def test_cli_encode_decode_info(wav_file, tmp_path):
    p, x, fs = wav_file
    pac, out = tmp_path / "o.pac", tmp_path / "o.wav"
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "PATH": "/usr/bin:/bin:/usr/local/bin"}
    r = subprocess.run([sys.executable, "-m", "tac.cli", "encode", str(p),
                        str(pac), "--preset", "stereo44-128"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "kbps" in json.loads(r.stdout.strip().splitlines()[-1])
    r = subprocess.run([sys.executable, "-m", "tac.cli", "decode", str(pac),
                        str(out)], capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "-m", "tac.cli", "info", str(pac)],
                       capture_output=True, text=True, env=env)
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["sample_rate"] == fs and info["n_channels"] == 2


def test_odd_length_and_mono(tmp_path):
    """Clip lengths that don't divide the hop + mono input."""
    fs = 16000
    for t_len in (1, 511, 512, 513, 10000):
        x = 0.3 * np.sin(2 * np.pi * 300 * np.arange(t_len) / fs)
        cfg = PRESETS["mono16-64"]
        y, fs2 = api.decode_array(api.encode_array(x, cfg))
        assert y.shape == (t_len, 1)
        if t_len > 1024:
            assert _snr(x, y[:, 0]) > 10


def test_encode_deterministic():
    """Same input twice → identical bytes (doubles as a host-pipeline race
    detector, SURVEY.md §5.2)."""
    fs = 16000
    rng = np.random.default_rng(11)
    x = 0.3 * rng.standard_normal(8000)
    cfg = PRESETS["mono16-64"]
    assert api.encode_array(x, cfg) == api.encode_array(x, cfg)
    vcfg = PRESETS["vbr-huffman"].replace(sample_rate=fs, n_channels=1,
                                          n_mdct_lines=512)
    assert api.encode_array(x, vcfg) == api.encode_array(x, vcfg)


def test_cli_corpus(tmp_path):
    fs = 16000
    paths = []
    for i in range(2):
        x = 0.4 * np.sin(2 * np.pi * (300 + 100 * i)
                         * np.arange(6000) / fs)
        p = tmp_path / f"c{i}.wav"
        write_wav(str(p), x, fs)
        paths.append(str(p))
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "PATH": "/usr/bin:/bin:/usr/local/bin"}
    r = subprocess.run([sys.executable, "-m", "tac.cli", "corpus",
                        *paths, "-o", str(tmp_path / "out"),
                        "--bitrate", "64000", "--lines", "256"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["ok"] == 2


def test_silence_and_fullscale(tmp_path):
    fs = 16000
    cfg = PRESETS["mono16-64"]
    z = np.zeros(4096)
    y = api.decode_array(api.encode_array(z, cfg))[0]
    assert np.max(np.abs(y)) < 1e-6
    f = 0.999 * np.sin(2 * np.pi * 440 * np.arange(4096) / fs)
    y = api.decode_array(api.encode_array(f, cfg))[0]
    # raw float decode may overshoot (MDCT ringing); WAV write clips to int16
    assert np.max(np.abs(y)) < 1.5
    assert _snr(f, y[:, 0]) > 10
