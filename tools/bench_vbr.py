"""VBR / combo ENCODE throughput on the live backend (VERDICT r2 item 1:
the serial bit-reservoir scan capped VBR encode at ~63 audio-sec/s device
vs 3160 fixed-rate — this tool tracks the attack on that gap).

Measures device-only audio-sec encoded per wall-second for the huffman-VBR
and combo (VBR+blockswitch) packed encode paths, single clip and (flat VBR)
an 8-clip batch. Prints one JSON line."""

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

    from tac import codec
    from tac.config import PRESETS

    secs = float(os.environ.get("TAC_BENCH_SECONDS", 60))
    iters = int(os.environ.get("TAC_BENCH_ITERS", 5))
    fs = 44100
    t = np.arange(int(fs * secs)) / fs
    rng = np.random.default_rng(0)
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.4, 440), (0.2, 880), (0.1, 1320), (0.03, 3080)])
    x = np.stack([sig, 0.8 * sig + 0.02 * rng.standard_normal(len(t))])
    xd = jnp.asarray(x, jnp.float32)

    out = {"backend": jax.default_backend(), "secs": secs}

    def timeit(fn):
        # np.asarray on a tiny output fences execution on the axon backend
        # (block_until_ready is a no-op over the remote tunnel); median of
        # `iters` — this box's per-dispatch RPC (~27 ms) makes short-clip
        # means overhead-dominated, so default secs is 60 (PERF.md)
        fn()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def chained(encfn, xin, k=4):
        # K encodes inside ONE dispatch, scalar pull — the per-dispatch
        # RPC (~28 ms) + nbits pull otherwise floor the measurement
        # (bench.py's round-3 methodology note)
        def run(xx):
            def body(carry, _):
                x2 = jnp.where(carry < 0, xx + jnp.float32(1), xx)
                return jnp.sum(encfn(x2)[1]).astype(jnp.float32), None
            s2, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return s2
        j = jax.jit(run)
        return lambda: np.asarray(j(xin)), k

    # --- flat huffman VBR, single clip
    # TAC_BENCH_VBR_SETS overrides huffman_sets for the n-way-min device
    # cost A/B (PERF.md round-5 tid3 section)
    n_sets = int(os.environ.get("TAC_BENCH_VBR_SETS", 0))
    cfg = PRESETS["vbr-huffman"]
    if n_sets:
        cfg = cfg.replace(huffman_sets=n_sets)
    out["huffman_sets"] = cfg.huffman_sets
    fn, k = chained(lambda xx: codec.encode_clip_vbr_packed(xx, cfg), xd)
    out["vbr_device"] = round(k * secs / timeit(fn), 1)

    # --- combo (VBR + blockswitch), single clip
    from tac import blockswitch as bsw
    ccfg = PRESETS["vbr-bs"]
    if n_sets:
        ccfg = ccfg.replace(huffman_sets=n_sets)
    fn, k = chained(lambda xx: bsw.encode_clip_bs_vbr_packed(xx, ccfg), xd)
    out["combo_device"] = round(k * secs / timeit(fn), 1)

    # --- flat VBR, 8-clip batch: the LANE-BATCHED leading entry (clips x
    # channels flatten into reservoir-scan lanes). vmap of the per-clip
    # entry would instead serialize 8 separate Pallas scans (measured
    # 95 ms vs ~12 ms for the lane-batched scan on 8x15 s). Plain
    # dispatches here, NOT the chained harness: chaining this big batch
    # measured +70% (151 -> 261 ms/iter — keeping the chain input live
    # defeats XLA's buffer reuse), while one 8x60-s dispatch is ~150 ms
    # against the ~28 ms RPC, so the raw quotient understates the chip
    # by <20%.
    b = int(os.environ.get("TAC_BENCH_VBR_CLIPS", 8))
    xb = jnp.asarray(np.stack([x] * b), jnp.float32)
    jb = jax.jit(lambda xx: codec._encode_vbr_packed_leading(xx, cfg))
    dt = timeit(lambda: np.asarray(jb(xb)[1][0, 0, 0]))
    out["vbr_batched_device"] = round(b * secs / dt, 1)

    # self-describing artifact (VERDICT r4 weak #4): a JSON found on
    # disk must carry its own config — clip count, clip length, chained
    # depth, backend — so no record is ambiguous about what it measured.
    import jax as _jax
    print(json.dumps({"metric": "vbr_encode_throughput",
                      "unit": "audio_sec_per_sec_per_chip",
                      "clips_batched": b, "clip_seconds": secs,
                      "chained_k": 4,
                      "backend": _jax.default_backend(), **out}))


if __name__ == "__main__":
    main()
