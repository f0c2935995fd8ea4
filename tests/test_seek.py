"""Random-access decode (api.decode_range): the covering-frame-subset
decode must reproduce the full decode's samples on [start, stop) for
every stream family, any alignment (frame-interior starts/stops, clamped
edges, empty ranges). SPEC.md §7 framing: sample s depends on frames
s//H and s//H+1 only."""

import numpy as np
import pytest

from tac import api
from tac.config import PRESETS

H = 256


def _sig(n_ch):
    fs = 16000
    t = np.arange(int(fs * 0.4)) / fs
    s = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1970 * t)
    s[3000:3120] += np.linspace(0, 0.4, 120)             # transient
    rng = np.random.default_rng(1)
    s = s + 0.01 * rng.standard_normal(len(t))
    return s if n_ch == 1 else np.stack([s, 0.8 * np.roll(s, 31)], 1)


FAMILIES = {
    "raw": PRESETS["mono16-64"].replace(n_mdct_lines=H, precision="fast"),
    "vbr": PRESETS["mono16-64"].replace(n_mdct_lines=H, use_huffman=True,
                                        use_psy=True, alloc_mode="greedy",
                                        precision="fast"),
    "bs": PRESETS["mono16-64"].replace(n_mdct_lines=H, use_block_switch=True,
                                       n_mdct_lines_short=64,
                                       precision="fast"),
    "ms-combo": PRESETS["mono16-64"].replace(n_mdct_lines=H, n_channels=2,
                                             stereo_mode="ms",
                                             use_block_switch=True,
                                             use_huffman=True,
                                             n_mdct_lines_short=64,
                                             use_psy=True,
                                             alloc_mode="greedy",
                                             precision="fast"),
}


@pytest.mark.parametrize("family", list(FAMILIES))
def test_decode_range_matches_full(family):
    cfg = FAMILIES[family]
    x = _sig(cfg.n_channels)
    data = api.encode_array(x, cfg)
    full, fs = api.decode_array(data, precision="fast")
    n = full.shape[0]
    rng = np.random.default_rng(7)
    ranges = [(0, n), (0, 1), (n - 1, n), (H, 3 * H),            # aligned
              (H - 1, H + 1), (5 * H + 17, 7 * H - 3)]           # interior
    ranges += [tuple(sorted(rng.integers(0, n, 2))) for _ in range(4)]
    for s0, s1 in ranges:
        got, fs2 = api.decode_range(data, s0, s1, precision="fast")
        assert fs2 == fs and got.shape == (s1 - s0, full.shape[1])
        np.testing.assert_allclose(got, full[s0:s1], atol=2e-5,
                                   err_msg=f"{family} range {s0}:{s1}")


def test_decode_range_edges():
    cfg = FAMILIES["raw"]
    x = _sig(1)
    data = api.encode_array(x, cfg)
    full, fs = api.decode_array(data, precision="fast")
    n = full.shape[0]
    got, _ = api.decode_range(data, 0, 0)
    assert got.shape == (0, 1)
    got, _ = api.decode_range(data, -50, n + 999)         # clamps
    np.testing.assert_allclose(got, full, atol=2e-5)
    got, _ = api.decode_range(data, n - 3, n + 10)        # tail clamp
    np.testing.assert_allclose(got, full[n - 3:], atol=2e-5)


def test_seek_compile_count():
    """50 random-length seeks compile at most log2(F)+1 device programs:
    decode_range buckets the covered frame count to powers of two (capped
    at F) so a seek server's jit cache is bounded (api.py docstring)."""
    from tac import codec

    cfg = FAMILIES["raw"]
    x = _sig(1)
    data = api.encode_array(x, cfg)
    full, _ = api.decode_array(data, precision="fast")
    n = full.shape[0]
    f = -(-n // H) + 1
    base = codec._decode_clip_packed_impl._cache_size()
    rng = np.random.default_rng(3)
    for _ in range(50):
        s0, s1 = sorted(int(v) for v in rng.integers(0, n, 2))
        s1 = max(s1, s0 + 1)
        got, _ = api.decode_range(data, s0, s1, precision="fast")
        np.testing.assert_allclose(got, full[s0:s1], atol=2e-5)
    grown = codec._decode_clip_packed_impl._cache_size() - base
    assert grown <= int(np.log2(f)) + 1, grown


def test_decode_range_parity_exact():
    """In parity precision the subset decode is bit-exact vs the full
    decode (f64 everywhere, no batch-shape ULP)."""
    cfg = FAMILIES["raw"].replace(precision="parity")
    x = _sig(1)
    data = api.encode_array(x, cfg)
    full, _ = api.decode_array(data, precision="parity")
    got, _ = api.decode_range(data, 3 * H + 5, 9 * H - 11,
                              precision="parity")
    assert np.array_equal(got, full[3 * H + 5: 9 * H - 11])
