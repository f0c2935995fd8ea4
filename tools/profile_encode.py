"""Ablation profile of the device encode path (ROADMAP perf frontier).

Times the fused packed encode on the live backend under config ablations
that isolate the major stages:

  full        psy masked threshold + greedy alloc (production)
  const_snr   no masking model (segment_max SPL), greedy loop still runs
  uniform     no psy at all, water-fill on zero need (loop floor)
  nowarm      full, but TAC_NO_WARMSTART=1 must be set by the caller

Prints one JSON line of ms/clip and audio-sec/s for each. Differences
between rows bound the stage costs (psy ≈ full − const_snr, etc.)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache = os.environ.get("TAC_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tac import codec
    from tac.config import PRESETS

    secs = float(os.environ.get("TAC_BENCH_SECONDS", 15))
    fs = 44100
    t = np.arange(int(fs * secs)) / fs
    rng = np.random.default_rng(0)
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.4, 440), (0.2, 880), (0.1, 1320), (0.03, 3080)])
    x = jnp.asarray(np.stack([sig, 0.8 * sig
                              + 0.02 * rng.standard_normal(len(t))]),
                    jnp.float32)

    base = PRESETS["stereo44-128"]
    ablations = {
        "full": base,
        "const_snr": base.replace(use_psy=False, alloc_mode="const_snr"),
        "uniform": base.replace(use_psy=False, alloc_mode="uniform"),
        "no_noise_maskers": base.replace(psy_noise_maskers=False),
        "maskers_16": base.replace(max_maskers=16),
    }
    out = {"warmstart": not os.environ.get("TAC_NO_WARMSTART"),
           "enc_chunk": codec._enc_chunk(), "backend": jax.default_backend()}
    iters = 10
    for name, cfg in ablations.items():
        w, n = codec.encode_clip_packed(x, cfg)
        np.asarray(n)
        t0 = time.perf_counter()
        for _ in range(iters):
            w, n = codec.encode_clip_packed(x, cfg)
            # np.asarray, not block_until_ready: on the axon remote
            # backend only a real fetch fences the execution
            np.asarray(n)
        dt = (time.perf_counter() - t0) / iters
        out[name + "_ms"] = round(dt * 1e3, 2)
        out[name + "_aps"] = round(secs / dt, 1)

    if os.environ.get("TAC_TRACE_DIR"):
        with jax.profiler.trace(os.environ["TAC_TRACE_DIR"]):
            w, n = codec.encode_clip_packed(x, base)
            np.asarray(n)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
