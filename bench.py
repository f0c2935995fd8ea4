"""North-star benchmark: audio-sec encoded per second per chip.

Flagship config (BASELINE config 2): stereo 44.1 kHz, full psychoacoustic
model, greedy allocation @128 kbps. Measures the FULL encode path — device
pipeline (window/MDCT/psy/alloc/quantize, one jit) plus host bitstream
packing — against the serial NumPy oracle (tac/oracle, the reference-style
implementation, BASELINE.md "reference encode speed" denominator).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_clips(b: int, seconds: float, fs: int = 44100) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(int(fs * seconds)) / fs
    clips = []
    for i in range(b):
        f0 = 220.0 * (1 + i % 8)
        sig = sum(a * np.sin(2 * np.pi * f0 * k * t)
                  for k, a in [(1, 0.4), (2, 0.2), (3, 0.1), (7, 0.03)])
        ch2 = 0.8 * sig + 0.02 * rng.standard_normal(len(t))
        clips.append(np.stack([sig, ch2]))
    return np.stack(clips).astype(np.float32)       # [B, 2, T]


def bench_tac(x: np.ndarray, cfg, iters: int = 3) -> float:
    """Returns audio-sec encoded per wall-second (full path, bytes out).

    Bit packing happens ON DEVICE (tac.ops.bitpack): the device→host
    transfer is just the payload words, i.e. ~the bitstream itself.
    """
    import jax

    from tac import parallel
    from tac.ops import bitpack as dbp

    fs = cfg.sample_rate
    b, c, t = x.shape
    # per-clip upload: the remote-TPU tunnel here is unreliable for large
    # single transfers, so stage the batch as B separate ~5 MB uploads
    import jax.numpy as jnp
    xd = jnp.stack([jax.device_put(x[i]) for i in range(b)])

    def drain(words, nbits):
        # one transfer each: per-clip downloads pay ~60 ms tunnel latency
        # apiece (measured: 8x chunked = 0.6 s vs 0.14 s for one 2 MB pull)
        w_np, n_np = np.asarray(words), np.asarray(nbits)
        return [dbp.rows_to_stream(w_np[i].swapaxes(0, 1),
                                   n_np[i].swapaxes(0, 1))
                for i in range(b)]

    drain(*parallel.encode_batch_packed(xd, cfg))   # compile + warm caches

    # device-only: K encodes chained inside ONE dispatch, one scalar pull.
    # A per-dispatch measurement pays ~28 ms tunnel RPC + a [B, C, F]
    # nbits pull against ~80 ms of chip compute, understating the chip by
    # 2-3x (the pre-round-4 numbers). The carry-guarded select defeats
    # DCE/cross-iteration overlap without changing runtime work.
    from tac import codec as _codec
    k_chain = 8

    def chained(xx):
        def body(carry, _):
            x2 = jnp.where(carry < 0, xx + jnp.float32(1), xx)
            _w2, n2 = _codec._encode_packed_leading(x2, cfg)
            return jnp.sum(n2).astype(jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k_chain)
        return s

    chainfn = jax.jit(chained)
    for attempt in range(3):                        # tunnel-flake tolerance
        try:
            np.asarray(chainfn(xd))                 # compile warm
            t0 = time.perf_counter()
            for _ in range(iters):
                np.asarray(chainfn(xd))
            dev_dt = (time.perf_counter() - t0) / (iters * k_chain)
            # NOTE: measured serial > software-pipelined here — the remote
            # tunnel serializes execute and transfer, so overlapping them
            # just adds contention (46.9 vs 102.9 audio-sec/s).
            t0 = time.perf_counter()
            for _ in range(iters):
                blobs = drain(*parallel.encode_batch_packed(xd, cfg))
            dt = (time.perf_counter() - t0) / iters
            assert sum(len(bl) for bl in blobs) > 0
            audio = b * (t / fs)
            return audio / dt, audio / dev_dt
        except Exception:
            if attempt == 2:
                raise
            time.sleep(2.0)


def bench_oracle(seconds: float = 2.0) -> float:
    """Serial reference-style encoder throughput (audio-sec/sec, 1 core)."""
    from tac.config import PRESETS
    from tac.oracle import encode_array

    cfg = PRESETS["stereo44-128"]
    x = make_clips(1, seconds)[0].T                 # [T, 2]
    # best-of-3: the denominator feeds vs_baseline, and a single CPU run
    # wobbles 2x+ with host load (observed 825..1909 in BENCH lines)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        data = encode_array(np.asarray(x, np.float64), cfg)
        dts.append(time.perf_counter() - t0)
    assert len(data) > 0
    return seconds / min(dts)


def main() -> None:
    """Parent: run the real bench in a child process, retrying on the
    remote-TPU tunnel's sporadic UNAVAILABLE faults (a faulted PJRT client
    never recovers in-process, so retries need a fresh interpreter)."""
    import os
    import subprocess
    import sys

    if os.environ.get("TAC_BENCH_CHILD"):
        return _bench_main()
    last = ""
    for attempt in range(3):
        env = dict(os.environ, TAC_BENCH_CHILD="1")
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True, env=env,
                           timeout=None)
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                print(line)
                return
        last = (r.stderr or "")[-2000:]
    print(json.dumps({"metric": "encode_throughput_44k_stereo",
                      "value": 0.0, "unit": "audio_sec_per_sec_per_chip",
                      "vs_baseline": 0.0, "error": last[-300:]}))


def _bench_main() -> None:
    import os

    import jax

    # persistent compile cache: retries and re-runs skip the slow remote
    # compile entirely
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tac.config import PRESETS

    cfg = PRESETS["stereo44-128"]                   # precision="fast"
    # staged as per-clip ~5 MB uploads (the remote-TPU tunnel in this box
    # is unreliable for single transfers much larger than ~20 MB); 16
    # clips measured best full-path on this link (8: 565, 16: 624,
    # 32: 628 audio-sec/s — host pack becomes the limiter past 16)
    b = int(os.environ.get("TAC_BENCH_CLIPS", "16"))
    secs = float(os.environ.get("TAC_BENCH_SECONDS", "15"))
    x = make_clips(b=b, seconds=secs, fs=cfg.sample_rate)
    tac_tput, dev_tput = bench_tac(x, cfg)
    oracle_tput = bench_oracle()
    print(json.dumps({
        "metric": "encode_throughput_44k_stereo",
        "value": round(tac_tput, 1),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(tac_tput / oracle_tput, 1),
        "device_only": round(dev_tput, 1),
        "clips": b, "clip_seconds": secs,
        "backend": jax.default_backend(),
        "note": "value = full path to bytes over this box's remote-TPU "
                "tunnel; device_only = chip compute (the link-independent "
                "number)",
    }))


if __name__ == "__main__":
    main()
