"""Mid/side joint-stereo ENCODE/DECODE throughput on the live backend
(SPEC.md §11 — the four ms presets, configs 7-10 in goldens).

Same methodology as tools/bench_vbr.py / bench.py (PERF.md round-3
note): device-only legs chain K iterations inside ONE dispatch with a
carry-guarded select (DCE-proof) and pull one scalar, so the ~28 ms
per-dispatch RPC of this box's remote-TPU tunnel doesn't floor the
measurement. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache = os.environ.get("TAC_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tac import blockswitch as bsw, codec
    from tac.config import PRESETS
    from tac.dsp.mdct import num_frames

    secs = float(os.environ.get("TAC_BENCH_SECONDS", 60))
    iters = int(os.environ.get("TAC_BENCH_ITERS", 5))
    fs = 44100
    t = np.arange(int(fs * secs)) / fs
    rng = np.random.default_rng(0)
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.4, 440), (0.2, 880), (0.1, 1320), (0.03, 3080)])
    # correlated pair (the ms win case) with uncorrelated dither
    x = np.stack([sig + 0.02 * rng.standard_normal(len(t)),
                  0.8 * sig + 0.02 * rng.standard_normal(len(t))])
    xd = jnp.asarray(x, jnp.float32)

    out = {"backend": jax.default_backend(), "secs": secs}

    def timeit(fn):
        fn()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def chained(encfn, xin, k=16):
        def run(xx):
            def body(carry, _):
                x2 = jnp.where(carry < 0, xx + jnp.float32(1), xx)
                return jnp.sum(encfn(x2)[1]).astype(jnp.float32), None
            s2, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return s2
        j = jax.jit(run)
        return lambda: np.asarray(j(xin)), k

    # --- encode: the four ms presets through their leading packed entries
    legs = {
        "ms": lambda xx: codec._encode_packed_leading(
            xx, PRESETS["stereo44-128-ms"]),
        "vbr_ms": lambda xx: codec._encode_vbr_packed_leading(
            xx, PRESETS["vbr-ms"]),
        "ms_bs": lambda xx: bsw._encode_bs_packed_leading(
            xx, PRESETS["ms-bs"]),
        "vbr_ms_bs": lambda xx: bsw._encode_bs_vbr_packed_leading(
            xx, PRESETS["vbr-ms-bs"]),
    }
    for name, encfn in legs.items():
        fn, k = chained(encfn, xd)
        out[f"{name}_encode_device"] = round(k * secs / timeit(fn), 1)

    # --- decode: fixed-rate ms (unpack → dequant → IMDCT → OA → butterfly)
    cfg = PRESETS["stereo44-128-ms"]
    words, _ = codec.encode_clip_packed(np.asarray(xd), cfg)
    tlen = num_frames(x.shape[1], cfg.n_mdct_lines) * cfg.n_mdct_lines
    wd = jnp.asarray(np.asarray(words))

    def dec_chained(k=32):
        def run(ww):
            def body(carry, _):
                w2 = jnp.where(carry < 0, ww + jnp.uint32(1), ww)
                y = codec._decode_clip_packed_impl(w2, cfg, tlen)
                return jnp.sum(y[:, :8]).astype(jnp.float32), None
            s2, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return s2
        j = jax.jit(run)
        return lambda: np.asarray(j(wd)), k

    fn, k = dec_chained()
    out["ms_decode_device"] = round(k * secs / timeit(fn), 1)

    print(json.dumps({"metric": "ms_throughput",
                      "unit": "audio_sec_per_sec_per_chip",
                      "clip_seconds": secs, "chained_k": 4,
                      "backend": jax.default_backend(), **out}))


if __name__ == "__main__":
    main()
