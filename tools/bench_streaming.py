"""Streaming encode/decode throughput on the live backend (VERDICT r2
item 2: round 2 pinned streaming *latency* (11.6 ms) and *bytes*
(stream == offline) but never measured streaming audio-sec/s).

Measures steady-state audio-sec per wall-second through StreamEncoder /
StreamDecoder for push sizes {1 frame (H samples), 16 frames, ~1 s} per
stream family {raw, vbr, bs, combo}. Each push is one batched jitted
call, so on a link with per-dispatch latency L the ceiling for a push of
d seconds of audio is d / (L + compute) — the tool also measures and
reports the null-dispatch latency so numbers off this box's remote
tunnel (~25-40 ms RPC) are interpretable. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def null_dispatch_ms() -> float:
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(8, jnp.float32)
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(f(x))
    return (time.perf_counter() - t0) / 5 * 1e3


def main() -> None:
    import jax

    cache = os.environ.get("TAC_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tac.config import PRESETS
    from tac.streaming import StreamDecoder, StreamEncoder

    fs = 44100
    modes = {"raw": "stereo44-128", "vbr": "vbr-huffman",
             "bs": "streaming-ll", "combo": "vbr-bs",
             "ms_combo": "vbr-ms-bs"}       # joint pair cores (SPEC §11×§9)
    out = {"backend": jax.default_backend(),
           "null_dispatch_ms": round(null_dispatch_ms(), 1)}

    rng = np.random.default_rng(0)
    t = np.arange(fs * 8) / fs
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 880 * t)
           + 0.02 * rng.standard_normal(len(t)))
    for p in range(5):
        i = int((0.1 + 0.17 * p) * len(sig))
        sig[i:i + 150] += np.linspace(0, 0.4, 150)
    x = np.stack([sig, 0.8 * sig], axis=1)               # [T, 2]

    for name, preset in modes.items():
        cfg = PRESETS[preset]
        h = cfg.n_mdct_lines
        for label, push in (("1f", h), ("16f", 16 * h), ("1s", fs)):
            enc = StreamEncoder(cfg, n_channels=2)
            # warm the jit for this bucket shape
            enc.push(x[:push])
            enc.push(x[push:2 * push])
            n_push = min(len(x) // push, 64 if label == "1f" else 1024)
            t0 = time.perf_counter()
            fed = 0
            blobs = []
            for i in range(2, n_push):
                blobs.append(enc.push(x[i * push:(i + 1) * push]))
                fed += push
            dt = time.perf_counter() - t0
            out[f"enc_{name}_{label}"] = round(fed / fs / dt, 1)

            if label == "16f":                  # decode bench on this size
                stream = enc.header(fed)
                payload = b"".join(blobs)
                dec, off = StreamDecoder.from_header(stream)
                chunk = max(len(payload) // (n_push - 2), 1)
                dec.push(payload[:chunk])
                dec.push(payload[chunk:2 * chunk])
                t0 = time.perf_counter()
                got = 0
                for i in range(2, n_push - 2):
                    y = dec.push(payload[i * chunk:(i + 1) * chunk])
                    got += y.shape[0]
                dt = time.perf_counter() - t0
                if got:
                    out[f"dec_{name}_{label}"] = round(got / fs / dt, 1)
        print(json.dumps({k: v for k, v in out.items() if name in k}),
              file=sys.stderr, flush=True)

    print(json.dumps({"metric": "streaming_throughput",
                      "unit": "audio_sec_per_sec_per_chip", **out}))


if __name__ == "__main__":
    main()
