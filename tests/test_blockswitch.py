"""Block-switching tests (SPEC.md §9; BASELINE config 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tac import api, blockswitch as bsw
from tac.config import PRESETS
from tac.dsp import mdct as fb
from tac.oracle import blockswitch as obs
from tac.oracle import decode_array as o_dec, encode_array as o_enc

CFG = PRESETS["streaming-ll"].replace(precision="parity")


def _snr(x, y):
    y = y[: len(x)]
    return 10 * np.log10(np.mean(x ** 2) / max(np.mean((x - y) ** 2), 1e-30))


@pytest.fixture(scope="module")
def transient_clip():
    fs = CFG.sample_rate
    t = np.arange(fs) / fs
    x = 0.3 * np.sin(2 * np.pi * 440 * t)
    for pos in (fs // 3, 2 * fs // 3):
        burst = np.exp(-np.arange(800) / 100.0) \
            * np.sin(2 * np.pi * 3000 * np.arange(800) / fs)
        x[pos:pos + 800] += 0.6 * burst
    return x, fs


def test_window_states_legal_sequences(rng):
    """Every adjacent state pair must be a TDAC-meshing pair."""
    legal = {(0, 0), (0, 1), (1, 2), (2, 2), (2, 3), (3, 0), (3, 1)}
    for _ in range(50):
        t_flags = jnp.asarray(rng.random(20) < 0.3)
        st = np.asarray(bsw.window_states(t_flags, 21))
        for a, b in zip(st[:-1], st[1:]):
            assert (int(a), int(b)) in legal, st


def test_states_match_oracle(rng):
    for _ in range(20):
        flags = rng.random(15) < 0.3
        f = 16
        st_j = np.asarray(bsw.window_states(jnp.asarray(flags), f))
        st_o = obs.window_states(flags, f)
        np.testing.assert_array_equal(st_j, st_o)


def test_transient_flags_match_oracle(transient_clip):
    x, fs = transient_clip
    fj = np.asarray(bsw.transient_flags(jnp.asarray(x), CFG))
    fo = obs.transient_flags(x, CFG)
    np.testing.assert_array_equal(fj, fo)
    assert fo.any()                      # the bursts are detected
    assert not fo.all()


def test_mixed_state_perfect_reconstruction(rng):
    """Unquantized window→MDCT→IMDCT→window→OA is PR for legal sequences."""
    cfg = CFG.replace(use_psy=False)
    c = bsw.make_bs_consts(cfg)
    h = cfg.n_mdct_lines
    x = rng.standard_normal(8 * h)
    frames = fb.frame_signal(jnp.asarray(x), h)
    states = np.zeros(frames.shape[0], np.int32)
    states[2], states[3], states[4], states[5] = 1, 2, 2, 3

    def rt(fr, st):
        w = c.state_windows[st]
        y_l = fb.imdct_fft(fb.mdct_fft(fr * w, h), h) * w
        sub = fr[c.sub_idx]
        ls = fb.mdct_fft(sub * c.short_window, cfg.n_mdct_lines_short)
        ys = jax.vmap(lambda l: fb.imdct_fft(l, l.shape[-1]))(ls) \
            * c.short_window
        y_s = jnp.zeros(2 * h, ys.dtype).at[c.sub_idx].add(ys)
        return jnp.where(st == 2, y_s, y_l)

    y = jax.vmap(rt)(frames, jnp.asarray(states))
    out = np.asarray(fb.overlap_add(y, h, len(x)))
    assert np.max(np.abs(out - x)) < 1e-10


def test_roundtrip_and_byte_parity(transient_clip):
    x, fs = transient_clip
    d_t = api.encode_array(x, CFG)
    assert d_t == o_enc(x, CFG)
    y, fs2 = api.decode_array(d_t)
    assert fs2 == fs
    assert _snr(x, y[:, 0]) > 12
    y_o, _ = o_dec(d_t)
    np.testing.assert_allclose(y_o[:, 0], y[: len(y_o), 0], atol=2e-6)


def test_states_switch_around_transient(transient_clip):
    x, fs = transient_clip
    bc = bsw.encode_clip_bs(jnp.asarray(x[None, :]), CFG)
    st = np.asarray(bc.state)[0]
    h = CFG.n_mdct_lines
    k = fs // 3 // h                     # frame index at the first burst
    assert (st[max(k - 2, 0):k + 3] == bsw.SHORT).any()
    assert (st == bsw.LONG).sum() > len(st) // 2
    # START immediately precedes every SHORT run; STOP follows
    runs = np.nonzero(st == bsw.SHORT)[0]
    assert st[runs.min() - 1] == bsw.START
    assert st[runs.max() + 1] == bsw.STOP


def test_all_transient_stream(rng):
    """Dense transients → mostly SHORT frames; stream stays decodable and
    byte-matches the oracle."""
    fs = CFG.sample_rate
    x = np.zeros(fs // 4)
    for pos in range(0, len(x) - 600, 700):
        x[pos:pos + 600] += np.exp(-np.arange(600) / 60.0) \
            * np.sin(2 * np.pi * 3000 * np.arange(600) / fs)
    d = api.encode_array(x, CFG)
    assert d == o_enc(x, CFG)
    y, _ = api.decode_array(d)
    assert _snr(x, y[:, 0]) > 8
    st = np.asarray(bsw.encode_clip_bs(jnp.asarray(x[None]), CFG).state)[0]
    assert (st == bsw.SHORT).sum() > len(st) // 2


def test_multichannel_roundtrip():
    """The format supports arbitrary channel counts (u16 nChannels)."""
    fs = 44100
    x4 = np.stack([0.3 * np.sin(2 * np.pi * (200 + i * 150)
                                * np.arange(20000) / fs)
                   for i in range(4)], 1)
    cfg = PRESETS["stereo44-128"].replace(n_channels=4)
    y4, fs2 = api.decode_array(api.encode_array(x4, cfg))
    assert fs2 == fs and y4.shape == x4.shape
    assert _snr(x4[:, 0], y4[:, 0]) > 15


def test_algorithmic_delay_under_20ms():
    """SPEC §9: delay = 2*H/fs (one half-block lookahead + one overlap)."""
    delay_s = 2 * CFG.n_mdct_lines / CFG.sample_rate
    assert delay_s < 0.020, delay_s


def test_pre_echo_reduction(transient_clip):
    """Block switching must reduce pre-echo error before the transient
    versus the same codec with switching disabled."""
    x, fs = transient_clip
    pos = fs // 3
    pre = slice(pos - 2 * CFG.n_mdct_lines, pos - 16)
    y_bs, _ = api.decode_array(api.encode_array(x, CFG))
    no_bs = CFG.replace(use_block_switch=False)
    y_no, _ = api.decode_array(api.encode_array(x, no_bs))
    err_bs = np.mean((x[pre] - y_bs[pre, 0]) ** 2)
    err_no = np.mean((x[pre] - y_no[pre, 0]) ** 2)
    assert err_bs <= err_no * 1.5
