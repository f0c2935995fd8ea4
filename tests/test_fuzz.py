"""Corruption fuzz across every decode surface (SURVEY.md §4 item 2;
VERDICT r2 item 6): seeded random bit flips, truncations and
length-prefix perturbations against valid streams of all four families,
asserting every case either raises a TYPED error (CorruptStreamError /
ValueError) or returns shape-correct audio — never a crash, hang,
native out-of-bounds, or an untyped numpy/jax fault.

Surfaces: api.decode_array (the device unpack graph for all families,
plus the C split_blocks walk), the host deserializers
(payload_to_frames / _vbr / _bs), and split_blocks itself in both its
native-C and python-fallback forms.
"""

import numpy as np
import pytest

from tac import api, bitstream as bs, native
from tac.config import PRESETS
from tac.native import CorruptStreamError

ALLOWED = (CorruptStreamError, ValueError)
N_FLIP, N_TRUNC, N_PREFIX = 120, 50, 40          # >= 200 cases per family

FAMILIES = {
    "raw": PRESETS["mono16-64"],
    "vbr": PRESETS["mono16-64"].replace(use_huffman=True,
                                        precision="fast", use_psy=True,
                                        alloc_mode="greedy"),
    "bs": PRESETS["mono16-64"].replace(use_block_switch=True,
                                       n_mdct_lines_short=128,
                                       precision="fast"),
    "combo": PRESETS["mono16-64"].replace(use_block_switch=True,
                                          use_huffman=True,
                                          n_mdct_lines_short=128,
                                          precision="fast"),
    # mid/side joint stereo (SPEC.md §11): the butterfly + joint 2B-band
    # allocation add their own decode surfaces (ms_inverse after unpack,
    # shared pair window state in the combo) — fuzz them too.
    "ms": PRESETS["mono16-64"].replace(n_channels=2, stereo_mode="ms",
                                       precision="fast", use_psy=True,
                                       alloc_mode="greedy"),
    "ms-combo": PRESETS["mono16-64"].replace(n_channels=2,
                                             stereo_mode="ms",
                                             use_block_switch=True,
                                             use_huffman=True,
                                             n_mdct_lines_short=128,
                                             precision="fast",
                                             use_psy=True,
                                             alloc_mode="greedy"),
}


@pytest.fixture(scope="module")
def streams():
    out = {}
    fs = 16000
    t = np.arange(int(fs * 0.35)) / fs
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 990 * t)
    sig[2000:2100] += np.linspace(0, 0.4, 100)           # transient
    stereo = np.stack([sig, np.roll(sig, 37) * 0.8], axis=1)
    for name, cfg in FAMILIES.items():
        data = api.encode_array(stereo if cfg.n_channels == 2 else sig, cfg)
        _, off = bs.read_header(data)
        out[name] = (bytes(data), off)
    return out


def _mutations(data: bytes, off: int, rng):
    """Yield >= 210 corrupt variants of one valid stream."""
    n = len(data)
    for _ in range(N_FLIP):
        buf = bytearray(data)
        for b in rng.integers(off * 8, n * 8, rng.integers(1, 17)):
            buf[b // 8] ^= 1 << (b % 8)
        yield bytes(buf)
    for _ in range(N_TRUNC):
        yield data[: int(rng.integers(off, n))]
    # length-prefix attacks need the true prefix positions
    k = 0
    pos = off
    prefixes = []
    while pos + 2 <= n:
        ln = data[pos] | (data[pos + 1] << 8)
        prefixes.append(pos)
        pos += 2 + ln
        k += 1
    for _ in range(N_PREFIX):
        buf = bytearray(data)
        p = prefixes[int(rng.integers(0, len(prefixes)))]
        v = int(rng.integers(0, 1 << 16))
        buf[p], buf[p + 1] = v & 0xFF, v >> 8
        yield bytes(buf)


def _check_decode(mutant: bytes, cfg):
    try:
        x, fs = api.decode_array(mutant, precision="fast")
    except ALLOWED:
        return
    hdr, _ = bs.read_header(mutant)
    assert x.shape == (hdr.num_samples, hdr.n_channels)
    assert np.all(np.isfinite(x))


@pytest.mark.parametrize("family", list(FAMILIES))
def test_fuzz_decode_array(streams, family, rng):
    data, off = streams[family]
    for mutant in _mutations(data, off, rng):
        _check_decode(mutant, FAMILIES[family])


@pytest.mark.parametrize("family", list(FAMILIES))
def test_fuzz_host_deserializer(streams, family, rng):
    """The host-side parse walk (numpy unpack + native huffman walk)."""
    from tac import blockswitch as bsw
    from tac.dsp.mdct import num_frames

    data, off = streams[family]
    cfg = FAMILIES[family]
    hdr, _ = bs.read_header(data)
    f = num_frames(hdr.num_samples, hdr.n_mdct_lines)
    for i, mutant in enumerate(_mutations(data, off, rng)):
        if i % 3:                       # host walk is slower; sample 1/3
            continue
        try:
            if cfg.use_block_switch:
                bsw.payload_to_frames_bs(mutant, off, f, cfg)
            elif cfg.use_huffman:
                api.payload_to_frames_vbr(mutant, off, f, cfg,
                                          hdr.n_mdct_lines)
            else:
                api.payload_to_frames(mutant, off, f, cfg,
                                      hdr.n_mdct_lines)
        except ALLOWED:
            pass


def test_fuzz_split_blocks_both_paths(streams, rng):
    """The container framing walk: native C and python fallback must agree
    on every corrupt input — same (offs, lens) or same typed error."""
    data, off = streams["raw"]
    import tac.native as nat

    real_lib = nat._lib
    for mutant in _mutations(data, off, rng):
        k = int(rng.integers(1, 24))
        outs = []
        for lib in (real_lib, lambda: None):
            nat._lib = lib
            try:
                outs.append(tuple(map(tuple, nat.split_blocks(mutant, off,
                                                              k))))
            except CorruptStreamError:
                outs.append("corrupt")
        nat._lib = real_lib
        assert outs[0] == outs[1], f"native vs fallback diverged: {outs}"


def test_fuzz_stream_decoder(streams, rng):
    """StreamDecoder.push with corrupt bytes under random chunking: typed
    error or finite shape-correct output, never a crash/hang."""
    from tac.streaming import StreamDecoder

    data, off = streams["vbr"]
    for i, mutant in enumerate(_mutations(data, off, rng)):
        if i % 5:                        # slower surface; sample 1/5
            continue
        try:
            dec, o = StreamDecoder.from_header(mutant)
            pos = o
            while pos < len(mutant):
                n = int(rng.integers(1, 900))
                y = dec.push(mutant[pos:pos + n])
                assert y.shape[1] == dec.cfg.n_channels
                assert np.all(np.isfinite(y))
                pos += n
        except ALLOWED:
            pass


@pytest.mark.parametrize("family", ["combo", "ms-combo"])
def test_fuzz_decode_range(streams, family, rng):
    """Random-access decode on corrupt streams and random ranges: typed
    error or the exact requested shape, finite values, never a crash."""
    data, off = streams[family]
    hdr, _ = bs.read_header(data)
    for i, mutant in enumerate(_mutations(data, off, rng)):
        if i % 5:                        # new jit shape per range; sample
            continue
        s0, s1 = sorted(int(v) for v in
                        rng.integers(-100, hdr.num_samples + 100, 2))
        try:
            x, fs = api.decode_range(mutant, s0, s1, precision="fast")
        except ALLOWED:
            continue
        lo = min(max(s0, 0), hdr.num_samples)
        hi = max(min(s1, hdr.num_samples), lo)
        assert x.shape == (hi - lo, hdr.n_channels)
        assert np.all(np.isfinite(x))
