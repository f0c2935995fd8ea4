"""Streaming encoder tests: offline-equivalence, chunking invariance,
checkpoint/resume (SURVEY.md §5.4)."""

import numpy as np
import pytest

from tac import api
from tac.config import PRESETS
from tac.streaming import StreamEncoder, StreamState


@pytest.fixture(scope="module")
def clip():
    fs = 44100
    t = np.arange(fs // 2) / fs
    x = 0.3 * np.sin(2 * np.pi * 440 * t)
    x[len(t) // 2:len(t) // 2 + 500] += 0.5 * np.exp(
        -np.arange(500) / 80.0) * np.sin(2 * np.pi * 2800 * np.arange(500) / fs)
    return x, fs


@pytest.mark.parametrize("preset", ["streaming-ll", "stereo44-128",
                                    "vbr-huffman", "vbr-bs"])
def test_stream_equals_offline(preset, clip):
    x, fs = clip
    cfg = PRESETS[preset].replace(precision="parity", n_channels=1,
                                  sample_rate=fs)
    offline = api.encode_array(x, cfg)
    enc = StreamEncoder(cfg, n_channels=1)
    stream = enc.header(len(x)) + enc.push(x) + enc.flush()
    assert stream == offline


def test_chunk_size_invariance(clip):
    x, fs = clip
    cfg = PRESETS["streaming-ll"].replace(precision="parity", n_channels=1,
                                          sample_rate=fs)
    enc = StreamEncoder(cfg, n_channels=1)
    out = [enc.header(len(x))]
    rng = np.random.default_rng(0)
    i = 0
    while i < len(x):
        n = int(rng.integers(1, 700))
        out.append(enc.push(x[i:i + n]))
        i += n
    out.append(enc.flush())
    assert b"".join(out) == api.encode_array(x, cfg)


def test_checkpoint_resume(clip):
    """Serialize StreamState mid-stream; resuming must be bit-exact."""
    x, fs = clip
    cfg = PRESETS["streaming-ll"].replace(precision="parity", n_channels=1,
                                          sample_rate=fs)
    cut = len(x) // 2 + 123
    enc = StreamEncoder(cfg, n_channels=1)
    part1 = enc.header(len(x)) + enc.push(x[:cut])
    blob = enc.state.to_bytes()

    enc2 = StreamEncoder(cfg, n_channels=1)
    enc2.state = StreamState.from_bytes(blob)
    part2 = enc2.push(x[cut:]) + enc2.flush()
    assert part1 + part2 == api.encode_array(x, cfg)


def test_checkpoint_resume_combo(clip):
    """Combo streams carry BOTH the reservoir and the transient-flag
    history; mid-stream resume must stay bit-exact (SPEC.md §8+§9)."""
    x, fs = clip
    cfg = PRESETS["vbr-bs"].replace(precision="parity", n_channels=1,
                                    sample_rate=fs, n_mdct_lines=256,
                                    n_mdct_lines_short=64)
    cut = len(x) // 2 + 123
    enc = StreamEncoder(cfg, n_channels=1)
    part1 = enc.header(len(x)) + enc.push(x[:cut])
    blob = enc.state.to_bytes()

    enc2 = StreamEncoder(cfg, n_channels=1)
    enc2.state = StreamState.from_bytes(blob)
    part2 = enc2.push(x[cut:]) + enc2.flush()
    assert part1 + part2 == api.encode_array(x, cfg)


def test_stream_decodable(clip):
    x, fs = clip
    cfg = PRESETS["streaming-ll"].replace(precision="parity", n_channels=1,
                                          sample_rate=fs)
    enc = StreamEncoder(cfg, n_channels=1)
    data = enc.header(len(x)) + enc.push(x) + enc.flush()
    y, fs2 = api.decode_array(data)
    assert fs2 == fs
    err = x - y[: len(x), 0]
    assert 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2)) > 12


@pytest.mark.parametrize("preset", ["stereo44-128", "vbr-huffman",
                                    "streaming-ll", "vbr-bs"])
def test_stream_decode_equals_offline(preset, clip):
    """StreamDecoder under random byte chunking reproduces the offline
    decode_array output (same device cores, so only batch-shape float
    ulps separate them) with the full sample count."""
    from tac.streaming import StreamDecoder
    x, fs = clip
    cfg = PRESETS[preset].replace(n_channels=1, sample_rate=fs,
                                  precision="fast")
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


def test_stream_decode_latency_one_half_block(clip):
    """Frame i's bytes finalize exactly samples [(i-1)H, iH): after k full
    frames the decoder has emitted (k-1)*H samples, never more."""
    from tac import bitstream as bs
    from tac.streaming import StreamDecoder
    x, fs = clip
    cfg = PRESETS["streaming-ll"].replace(n_channels=1, sample_rate=fs,
                                          precision="fast")
    h = cfg.n_mdct_lines
    data = api.encode_array(x, cfg)
    dec, off = StreamDecoder.from_header(data)
    from tac.dsp.mdct import num_frames
    hdr, _ = bs.read_header(data)
    f = num_frames(hdr.num_samples, h)
    offs, lens = bs.split_blocks(data, off, f)     # mono: 1 block per frame
    got = 0
    for i in range(min(f, 6)):
        chunk = data[offs[i] - 2: offs[i] + lens[i]]
        got += dec.push(chunk).shape[0]
        expect = min(max(i, 0) * h, hdr.num_samples)
        assert got == expect, (i, got, expect)


def test_stream_decode_live_pipeline(clip):
    """Encoder → decoder chained push-by-push: the end-to-end streamed
    round trip matches the offline round trip."""
    from tac.streaming import StreamDecoder
    x, fs = clip
    cfg = PRESETS["streaming-ll"].replace(n_channels=1, sample_rate=fs,
                                          precision="fast")
    enc = StreamEncoder(cfg, n_channels=1)
    dec = None
    outs = []
    i = 0
    rng = np.random.default_rng(9)
    while i < len(x):
        n = int(rng.integers(200, 2000))
        by = enc.push(x[i:i + n])
        i += n
        if dec is None:
            dec, off = StreamDecoder.from_header(enc.header(len(x)) + by)
            by = (enc.header(len(x)) + by)[off:]
        outs.append(dec.push(by))
    outs.append(dec.push(enc.flush()))
    y_st = np.concatenate(outs, 0)
    y_off, _ = api.decode_array(api.encode_array(x, cfg), precision="fast")
    assert y_st.shape == y_off.shape
    np.testing.assert_allclose(y_st, y_off, atol=2e-5)


def test_stream_decode_rejects_oversize_block(clip):
    """A length prefix larger than the frame capacity must raise a clear
    corrupt-stream error, not decode garbage."""
    import struct
    from tac.native import CorruptStreamError
    from tac.streaming import StreamDecoder
    x, fs = clip
    cfg = PRESETS["stereo44-128"].replace(n_channels=1, sample_rate=fs,
                                          precision="fast")
    data = api.encode_array(x, cfg)
    dec, off = StreamDecoder.from_header(data)
    bogus = struct.pack("<H", 0xFFF0) + b"\x00" * 0xFFF0
    with pytest.raises(CorruptStreamError):
        dec.push(bogus)


def test_chunked_stereo_parity_equals_offline(clip):
    """Chunked stereo pushes, parity precision: bit-exact vs offline for
    the flat-VBR path (the original chunk-invariance test only covered
    mono streaming-ll; a stereo fast-mode ulp flip hid here untested)."""
    x, fs = clip
    x2 = np.stack([x, 0.7 * x], axis=1)
    cfg = PRESETS["vbr-huffman"].replace(precision="parity", sample_rate=fs)
    enc = StreamEncoder(cfg, n_channels=2)
    out = [enc.header(len(x2))]
    for i in range(0, len(x2), 3000):
        out.append(enc.push(x2[i:i + 3000]))
    out.append(enc.flush())
    assert b"".join(out) == api.encode_array(x2, cfg)


def test_chunked_fast_mode_contract(clip):
    """Fast precision: chunked pushes may legally differ from offline by
    occasional grid-tie allocation flips (XLA f32 kernels are batch-
    shape-dependent), but rate stays within 0.1% and the decoded PCM of
    stream vs offline must agree to >= 40 dB."""
    x, fs = clip
    x2 = np.stack([x, 0.7 * x], axis=1)
    cfg = PRESETS["vbr-huffman"].replace(sample_rate=fs)
    offline = api.encode_array(x2, cfg)
    enc = StreamEncoder(cfg, n_channels=2)
    out = [enc.header(len(x2))]
    for i in range(0, len(x2), 3000):
        out.append(enc.push(x2[i:i + 3000]))
    out.append(enc.flush())
    stream = b"".join(out)
    assert abs(len(stream) - len(offline)) <= max(4, len(offline) // 1000)
    ys, _ = api.decode_array(stream, precision="fast")
    yo, _ = api.decode_array(offline, precision="fast")
    n = min(len(ys), len(yo))
    err = ys[:n] - yo[:n]
    snr = 10 * np.log10(np.sum(yo[:n] ** 2)
                        / max(np.sum(err ** 2), 1e-30))
    assert snr >= 40.0, snr


def test_streaming_steady_state_no_retrace_and_cpu_floor():
    """VERDICT r3 item 6: two contracts the suite would otherwise miss.

    (1) Steady-state same-size pushes must NOT retrace the jitted push
    cores — an accidental per-push retrace (e.g. a bucket-rounding bug in
    streaming._bucket) is a silent ~100x throughput regression that every
    correctness test would still pass. Counted via the cores' jit cache
    size.
    (2) A CPU-backend absolute floor: steady-state 1-s pushes at >= 1x
    real time (raw) / >= 0.3x (VBR — the serial reservoir scan is chip
    work; measured ~1.4x raw, ~0.5x vbr on this 1-core box, floors leave
    headroom for loaded CI). The TPU floor test below covers real-chip
    attach."""
    import time

    import jax

    from tac import codec

    fs = 44100
    t = np.arange(fs * 5) / fs
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * np.sin(2 * np.pi * 3100 * t)
    x2 = np.stack([x, 0.7 * x], axis=1)
    cases = [("stereo44-128", codec._encode_frames_packed_halves, 1.0),
             ("vbr-huffman", codec._encode_frames_vbr_packed, 0.3)]
    for preset, core, floor in cases:
        cfg = PRESETS[preset].replace(n_channels=2, sample_rate=fs)
        enc = StreamEncoder(cfg, n_channels=2)
        out = enc.push(x2[:fs]) + enc.push(x2[fs:2 * fs])   # warm the bucket
        base = core._cache_size()
        n = 3
        t0 = time.perf_counter()
        for i in range(2, 2 + n):
            out += enc.push(x2[i * fs:(i + 1) * fs])
        dt = time.perf_counter() - t0
        assert core._cache_size() == base, \
            f"{preset}: steady-state push retraced the core"
        assert len(out) > 0
        if jax.default_backend() == "cpu":
            rate = n / dt
            assert rate >= floor, (preset, rate)


def test_streaming_realtime_floor_on_tpu():
    """VERDICT r2 item 2's floor: >= 1x real time at H-sized pushes and
    >= 50x at 1-s pushes. Push throughput is dispatch-latency-bound
    (one jitted call per push), so the floor only means anything where
    a dispatch is cheap: this asserts on a REAL TPU attach (null
    dispatch < 5 ms) and skips on CPU suites and on remote-tunnel boxes
    (~27 ms/RPC here — tools/bench_streaming.py records those numbers
    with the null-dispatch context instead)."""
    import time

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        pytest.skip("floor is a TPU contract")
    f = jax.jit(lambda v: v + 1.0)
    v = jnp.zeros(8, jnp.float32)
    np.asarray(f(v))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(f(v))
    null_ms = (time.perf_counter() - t0) / 5 * 1e3
    if null_ms > 5.0:
        pytest.skip(f"dispatch latency {null_ms:.1f} ms: link-bound box")

    fs = 44100
    cfg = PRESETS["stereo44-128"]
    h = cfg.n_mdct_lines
    x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(fs * 4) / fs)
    x2 = np.stack([x, 0.7 * x], axis=1)
    for push, floor in ((h, 1.0), (fs, 50.0)):
        enc = StreamEncoder(cfg, n_channels=2)
        enc.push(x2[:push]); enc.push(x2[push:2 * push])   # warm
        n = min(len(x2) // push, 32)
        t0 = time.perf_counter()
        for i in range(2, n):
            enc.push(x2[i * push:(i + 1) * push])
        rate = (n - 2) * push / fs / (time.perf_counter() - t0)
        assert rate >= floor, (push, rate)
