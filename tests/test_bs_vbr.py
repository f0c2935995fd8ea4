"""Huffman VBR x block switching combo tests (SPEC.md §8 + §9).

v1 forbade the combination; v2 composes them: the bit-reservoir scan prices
mantissas with the frame's window-state band map (grouped short vs long),
and the payload carries [2-bit state | ovs | 2-bit tableId | ...].
Byte parity against the serial oracle is the contract, same as every other
stream family (tests/test_blockswitch.py, tests/test_huffman.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tac import api, blockswitch as bsw
from tac.config import PRESETS
from tac.oracle import decode_array as o_dec, encode_array as o_enc

CFG = PRESETS["vbr-bs"].replace(precision="parity", n_mdct_lines=256,
                                n_mdct_lines_short=64)


def _snr(x, y):
    y = y[: len(x)]
    return 10 * np.log10(np.mean(x ** 2) / max(np.mean((x - y) ** 2), 1e-30))


@pytest.fixture(scope="module")
def clip():
    """Tonal bed + transient bursts: exercises LONG/START/SHORT/STOP states
    AND both tableId decisions in one stream."""
    fs = CFG.sample_rate
    rng = np.random.default_rng(11)
    t = np.arange(fs // 2) / fs
    x = 0.35 * np.sin(2 * np.pi * 440 * t) \
        + 0.12 * np.sin(2 * np.pi * 1320 * t)
    for pos in (fs // 6, fs // 3):
        burst = np.exp(-np.arange(700) / 80.0) \
            * np.sin(2 * np.pi * 3200 * np.arange(700) / fs)
        x[pos:pos + 700] += 0.6 * burst
    x2 = np.stack([x, 0.8 * x + 0.01 * rng.standard_normal(len(t))], 1)
    return x2, fs


def test_byte_parity_vs_oracle(clip):
    x, fs = clip
    d_t = api.encode_array(x, CFG)
    assert d_t == o_enc(x, CFG)


def test_roundtrip_and_decode_parity(clip):
    x, fs = clip
    d = api.encode_array(x, CFG)
    y, fs2 = api.decode_array(d)
    assert fs2 == fs
    assert _snr(x[:, 0], y[:, 0]) > 12
    y_o, _ = o_dec(d)
    np.testing.assert_allclose(y_o, y[: len(y_o)], atol=2e-6)


def test_stream_uses_both_states_and_tables(clip):
    """The golden-style clip must actually exercise the combined modes:
    SHORT frames present AND huffman-coded blocks present."""
    x, fs = clip
    from tac import codec

    c = bsw.make_bs_consts(CFG)
    xt = jnp.asarray(x.T)
    from tac.dsp import mdct as fb
    frames = fb.frame_signal(xt, CFG.n_mdct_lines)
    f = frames.shape[1]
    states = bsw.window_states(bsw.transient_flags(xt, CFG), f)
    cost_tab = codec.cost_tables(CFG)     # per-set tuple (SPEC §8 v3)
    import jax
    bc, tids, _ = jax.vmap(
        lambda fr, st: bsw._encode_channel_bs_vbr(fr, st, 0, CFG, c,
                                                  cost_tab))(frames, states)
    st = np.asarray(bc.state)
    tid = np.asarray(tids)
    assert (st == bsw.SHORT).any() and (st == bsw.LONG).any()
    assert (tid >= 1).any(), "no block chose the huffman tables"


def test_reservoir_banks_bits(clip):
    """Tonal content must bank reservoir bits (combo stream strictly smaller
    than the same stream with huffman disabled, which includes a 2-bit
    tableId's worth of extra mantissa budget — so compare coded sizes)."""
    x, fs = clip
    d_combo = api.encode_array(x, CFG)
    d_plain = api.encode_array(x, CFG.replace(use_huffman=False))
    assert len(d_combo) < len(d_plain)


def test_transient_only_stream_roundtrips():
    """All-short streams take the grouped band map through the huffman
    pricing and the decode scan."""
    fs = CFG.sample_rate
    x = np.zeros(fs // 8)
    for pos in range(0, len(x) - 600, 700):
        x[pos:pos + 600] += np.exp(-np.arange(600) / 60.0) \
            * np.sin(2 * np.pi * 3000 * np.arange(600) / fs)
    d = api.encode_array(x, CFG.replace(n_channels=1))
    assert d == o_enc(x, CFG.replace(n_channels=1))
    y, _ = api.decode_array(d)
    assert _snr(x, y[:, 0]) > 8


def test_fast_precision_roundtrips(clip):
    """The TPU speed path (f32 matmul MDCT) also encodes/decodes the combo."""
    x, fs = clip
    cfg = CFG.replace(precision="fast")
    d = api.encode_array(x, cfg)
    y, _ = api.decode_array(d, precision="fast")
    assert _snr(x[:, 0], y[:, 0]) > 12
