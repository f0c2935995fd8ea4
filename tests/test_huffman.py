"""Huffman VBR tests (SPEC.md §8; BASELINE config 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tac import api, codec, huffman as hf
from tac.config import PRESETS
from tac.oracle import decode_array as o_dec, encode_array as o_enc


def _snr(x, y):
    y = y[: len(x)]
    return 10 * np.log10(np.mean(x ** 2) / max(np.mean((x - y) ** 2), 1e-30))


@pytest.fixture(scope="module")
def clip44():
    fs = 44100
    t = np.arange(fs // 2) / fs
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.43, 440), (0.24, 554), (0.15, 660),
                           (0.12, 880), (0.05, 4400), (0.03, 8800)])
    rng = np.random.default_rng(42)
    return np.stack([sig, 0.8 * sig + 0.02 * rng.standard_normal(len(t))],
                    1), fs


def test_tables_are_prefix_free():
    for m, t in hf.load_tables().items():
        lens, codes = t["lengths"], t["codes"]
        live = [(int(l), int(c)) for l, c in zip(lens, codes) if l > 0]
        # canonical codes: no codeword is a prefix of another
        for i, (l1, c1) in enumerate(live):
            for l2, c2 in live[i + 1:]:
                lo, hi = sorted([(l1, c1), (l2, c2)])
                assert (hi[1] >> (hi[0] - lo[0])) != lo[1]
        assert lens[-1] > 0                      # escape always codable


def test_cost_table_matches_lengths():
    tabs = hf.load_tables()
    cost = hf.cost_table_np()
    for m in range(hf.MIN_M, hf.MAX_M + 1):
        lens = tabs[m]["lengths"]
        for s in range(2 ** m):
            expect = lens[s] if lens[s] > 0 else lens[-1] + m
            assert cost[m - hf.MIN_M, s] == expect


def test_encode_fields_decode_lines_roundtrip(rng):
    """Host Huffman serialize → bit-walk decode is the identity."""
    from tac import bitstream as bs
    m_line = rng.integers(0, 17, 300)
    m_line[m_line == 1] = 0                      # alloc ∈ {0} ∪ [2, 16]
    mant = np.array([rng.integers(0, 1 << m) if m else 0 for m in m_line])
    vals, wids = hf.encode_fields(mant[None], m_line[None])
    packed = bs.pack_fields(vals.ravel(), wids.ravel())
    bits = np.unpackbits(packed)
    out, end = hf.decode_lines(bits, 0, m_line)
    np.testing.assert_array_equal(out, mant)
    assert end == int(wids.sum())


def test_vbr_byte_parity_vs_oracle(clip44):
    x, fs = clip44
    cfg = PRESETS["vbr-huffman"].replace(precision="parity")
    assert api.encode_array(x, cfg) == o_enc(x, cfg)


def test_vbr_roundtrip_and_gain(clip44):
    """VBR at the same nominal rate must beat fixed-rate SNR (reservoir)."""
    x, fs = clip44
    cfg = PRESETS["vbr-huffman"].replace(precision="parity")
    data = api.encode_array(x, cfg)
    y, _ = api.decode_array(data)
    fixed = PRESETS["stereo44-128"].replace(precision="parity")
    y_fixed, _ = api.decode_array(api.encode_array(x, fixed))
    assert _snr(x, y) > _snr(x, y_fixed) + 0.2
    # oracle can decode the tac VBR stream
    y_o, _ = o_dec(data)
    np.testing.assert_allclose(y_o, y[: len(y_o)], atol=2e-6)


def test_vbr_rd_sweep(clip44):
    """BASELINE config 3: 32-256 kbps R-D curve is monotone."""
    x, fs = clip44
    snrs = []
    for kbps in (32, 64, 128, 256):
        cfg = PRESETS["vbr-huffman"].replace(bitrate_bps=kbps * 1000)
        y, _ = api.decode_array(api.encode_array(x, cfg))
        snrs.append(_snr(x, y))
    assert all(b > a - 0.5 for a, b in zip(snrs, snrs[1:]))
    assert snrs[-1] > snrs[0] + 5


def test_device_pack_matches_host_serializer(clip44):
    """The fused device huffman pack (encode_clip_vbr_packed) emits the
    exact bytes of the host reference serializer (frames_to_payload_vbr)."""
    from tac import bands
    from tac.ops import bitpack as dbp

    x, fs = clip44
    cfg = PRESETS["vbr-huffman"].replace(precision="parity")
    xt = jnp.asarray(x.T)
    vbr = codec.encode_clip_vbr(xt, cfg)
    host = api.frames_to_payload_vbr(
        vbr, cfg, cfg.n_mdct_lines,
        bands.lines_per_band(cfg.sample_rate, cfg.n_mdct_lines))
    words, nbits = codec.encode_clip_vbr_packed(xt, cfg)
    dev = dbp.rows_to_stream(np.asarray(words).swapaxes(0, 1),
                             np.asarray(nbits).swapaxes(0, 1))
    assert dev == host


def test_reservoir_bounded(clip44):
    x, fs = clip44
    cfg = PRESETS["vbr-huffman"]
    vbr = codec.encode_clip_vbr(jnp.asarray(x.T), cfg)
    used = np.asarray(vbr.used_bits)
    c = codec.make_consts(cfg)
    # with the cap, no frame may allocate more than base + cap
    assert used.max() <= c.budget * (1 + cfg.reservoir_factor)
    assert np.all(np.asarray(vbr.table_id) <= 1)
