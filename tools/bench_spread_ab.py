"""Same-process interleaved A/B of the psy spreading formulation on the
live backend: log2-domain exp2 spread (TAC_FAST_SPREAD=1) vs the exp10
production formulation (default). Round-4 verdict on the v5e: exp2 arm
0.92x whole-encode, 0.937x isolated masked_threshold — the spread grid
is traversal-bound, so the exp2 knob defaults OFF (PERF.md round 4).

The gate is read at TRACE time, so one process traces both variants by
flipping the env var between two jit closures; timing then interleaves
chained-dispatch measurements (PERF.md methodology: K encodes chained in
one dispatch behind a carry-guarded select, one scalar pull) so tunnel
drift hits both arms equally. Prints one JSON line."""

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

    secs = float(os.environ.get("TAC_BENCH_SECONDS", 60))
    fs = 44100
    t = np.arange(int(fs * secs)) / fs
    rng = np.random.default_rng(0)
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.4, 440), (0.2, 880), (0.1, 1320), (0.03, 3080)])
    x = jnp.asarray(np.stack([sig, 0.8 * sig
                              + 0.02 * rng.standard_normal(len(t))]),
                    jnp.float32)
    cfg = PRESETS["stereo44-128"]
    k_chain = 8

    # NOT codec._encode_packed_leading directly: that module-level jit
    # caches its inner jaxpr per (shape, cfg), so the second arm would
    # silently inline the FIRST arm's trace (same shapes, same cfg) and
    # the A/B would time two copies of one program. __wrapped__ re-traces
    # the Python body under each arm's env setting.
    enc_raw = codec._encode_packed_leading.__wrapped__

    def make_chain():
        def chained(xx):
            def body(carry, _):
                x2 = jnp.where(carry < 0, xx + jnp.float32(1), xx)
                _w, n2 = enc_raw(x2, cfg)
                return jnp.sum(n2).astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k_chain)
            return s
        return jax.jit(chained)

    os.environ["TAC_FAST_SPREAD"] = "1"
    fn_fast = make_chain()
    np.asarray(fn_fast(x))                           # trace+compile arm A
    os.environ.pop("TAC_FAST_SPREAD", None)
    fn_exp10 = make_chain()
    np.asarray(fn_exp10(x))                          # trace+compile arm B

    reps = int(os.environ.get("TAC_AB_REPS", 7))
    times = {"fast": [], "exp10": []}
    for _ in range(reps):
        for name, fn in (("fast", fn_fast), ("exp10", fn_exp10)):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            times[name].append((time.perf_counter() - t0) / k_chain)
    audio = 2 * secs / 2                             # stereo clip: secs of audio
    med = {k: float(np.median(v)) for k, v in times.items()}
    print(json.dumps({
        "metric": "psy_spread_ab_chained_device",
        "seconds_per_clip": secs,
        "fast_aps": secs / med["fast"],
        "exp10_aps": secs / med["exp10"],
        "speedup": med["exp10"] / med["fast"],
        "fast_ms": med["fast"] * 1e3, "exp10_ms": med["exp10"] * 1e3,
        "reps": reps, "audio_sec": audio,
    }))


if __name__ == "__main__":
    main()
