"""Warm-start trip-count A/B on the live chip (VERDICT r3 item 7).

The VBR reservoir scan's per-step cost = in-kernel warm start (straight-
line bisection, TAC_WS_ROUNDS x TAC_WS_BISECT) + the data-dependent
while_loop tail; both knobs are decision-exact at ANY setting
(pallas_alloc's prefix lemma), so the only question is wall-clock.

Method: phase-1 analysis (smr + pricing tables) computed ONCE from a
real 60-s clip; each (rounds, bisect) arm is a FRESH jax.jit of the
scan wrapper's __wrapped__ traced under its env setting (the knobs are
read at trace time — a shared jit would silently time one trace, the
round-4 A/B harness lesson); timing interleaves all arms in one
process, chained K=4 scans per dispatch, median of reps. Prints one
JSON line keyed by "rounds x bisect".
"""

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

    from tac import bitalloc as ba, codec
    from tac.config import PRESETS
    from tac.dsp import mdct as fb
    from tac.ops import pallas_vbr_scan as pvs

    secs = float(os.environ.get("TAC_BENCH_SECONDS", 60))
    fs = 44100
    t = np.arange(int(fs * secs)) / fs
    rng = np.random.default_rng(0)
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.4, 440), (0.2, 880), (0.1, 1320), (0.03, 3080)])
    x = jnp.asarray(np.stack([sig, 0.8 * sig
                              + 0.02 * rng.standard_normal(len(t))]),
                    jnp.float32)
    cfg = PRESETS["vbr-huffman"]
    c = codec.make_consts(cfg)

    # phase 1 once: frames -> (smr, pricing) in scan geometry [F, L, B(,7S)]
    frames = fb.frame_signal(x, cfg.n_mdct_lines)
    lanes, f = frames.shape[0], frames.shape[1]
    rows = frames.reshape(lanes * f, frames.shape[-1])
    _, smr, bh = codec._map_row_chunks(
        lambda fr: codec._vbr_phase1(fr, cfg, c), (rows,), lanes * f)
    to_lf = lambda a: a.reshape(lanes, f, *a.shape[1:]).swapaxes(0, 1)
    smr_q = jax.device_put(ba.snap_smr(to_lf(smr)).astype(jnp.float32))
    bh = jax.device_put(to_lf(bh))
    nl = c.n_lines
    res0 = jnp.zeros((lanes,), jnp.int32)
    base = int(c.budget)
    cap = int(cfg.reservoir_factor * c.budget)
    k_chain = 4

    raw_scan = pvs.vbr_reservoir_scan.__wrapped__

    def make_arm(rounds: int, bisect: int):
        os.environ["TAC_WS_ROUNDS"] = str(rounds)
        os.environ["TAC_WS_BISECT"] = str(bisect)

        def chained(sm):
            def body(carry, _):
                s2 = jnp.where(carry < 0, sm + jnp.float32(1), sm)
                _, _, used, _ = raw_scan(s2, bh, nl, res0, base=base,
                                         cap=cap, max_mant=16,
                                         nb=int(nl.shape[0]))
                return jnp.sum(used).astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=k_chain)
            return s

        fn = jax.jit(chained)
        np.asarray(fn(smr_q))                    # trace+compile this arm
        os.environ.pop("TAC_WS_ROUNDS", None)
        os.environ.pop("TAC_WS_BISECT", None)
        return fn

    grid_env = os.environ.get("TAC_WS_GRID",
                              "2x20,1x20,2x12,1x12,3x20,2x28,1x32")
    grid = [tuple(int(v) for v in g.split("x"))
            for g in grid_env.split(",")]
    arms = {f"{r}x{b}": make_arm(r, b) for r, b in grid}
    reps = int(os.environ.get("TAC_AB_REPS", 7))
    times = {k: [] for k in arms}
    for _ in range(reps):
        for k, fn in arms.items():
            t0 = time.perf_counter()
            np.asarray(fn(smr_q))
            times[k].append((time.perf_counter() - t0) / k_chain)
    med = {k: round(float(np.median(v) * 1e3), 2) for k, v in times.items()}
    out = {"metric": "vbr_scan_warmstart_ab_ms_per_scan",
           "seconds_per_clip": secs, "frames": int(f), **med}
    print(json.dumps(out), flush=True)

    # --- fixed-rate leg: water_fill_rows in isolation (the flagship's
    # allocation kernel, 0.12 of the 0.74 ms chunk) on real smr rows,
    # same fresh-jit-per-arm + interleaved-median methodology.
    from tac.ops import pallas_alloc as pa

    fcfg = PRESETS["stereo44-128"]
    fc = codec.make_consts(fcfg)
    fframes = fb.frame_signal(x, fcfg.n_mdct_lines)
    frows = fframes.reshape(-1, fframes.shape[-1])[:1024]
    _, smr_f = jax.jit(jax.vmap(
        lambda fr: codec.analyze_frame(fr, fcfg, fc)))(frows)
    smr_rows = jax.device_put(ba.snap_smr(smr_f).astype(jnp.float32))
    fnl = fc.n_lines
    fbud = jnp.full((smr_rows.shape[0],), int(fc.budget), jnp.int32)
    a0 = jnp.zeros(smr_rows.shape, jnp.int32)
    raw_wf = pa.water_fill_rows.__wrapped__
    k_wf = 8

    def make_wf_arm(rounds: int, bisect: int):
        os.environ["TAC_WS_ROUNDS"] = str(rounds)
        os.environ["TAC_WS_BISECT"] = str(bisect)

        def chained(sm):
            def body(carry, _):
                s2 = jnp.where(carry < 0, sm + jnp.float32(1), sm)
                al = raw_wf(s2, fnl, a0, fbud, max_mant=16,
                            nb=int(fnl.shape[0]), warm=True)
                return jnp.sum(al).astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k_wf)
            return s
        fn = jax.jit(chained)
        np.asarray(fn(smr_rows))
        os.environ.pop("TAC_WS_ROUNDS", None)
        os.environ.pop("TAC_WS_BISECT", None)
        return fn

    wf_arms = {f"{r}x{b}": make_wf_arm(r, b) for r, b in grid}
    wf_times = {k: [] for k in wf_arms}
    for _ in range(reps):
        for k, fn in wf_arms.items():
            t0 = time.perf_counter()
            np.asarray(fn(smr_rows))
            wf_times[k].append((time.perf_counter() - t0) / k_wf * 1e3)
    wf_med = {k: round(float(np.median(v)), 3) for k, v in wf_times.items()}
    print(json.dumps({"metric": "waterfill_warmstart_ab_ms_per_1024rows",
                      **wf_med}))


if __name__ == "__main__":
    main()
