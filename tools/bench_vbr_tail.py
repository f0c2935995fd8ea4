"""VBR scan tail floor probe (VERDICT r4 item 5 — attack or retire the
~15 us/frame serial tail).

The reservoir scan's per-step cost decomposes as: warm start (straight-
line, 1x12) + the data-dependent water-fill while_loop tail (lone-bit
freezes + post-freeze regrants) + pricing/clamp. The round-4 knobs make
the tail's share DIRECTLY measurable on chip:

  prefix    K straight-line body applications BEFORE the loop —
            decision-exact at any K (post-done body applications are the
            identity), so a prefix arm that wins is SHIPPABLE;
  max_trips measurement-only truncation of the loop (NOT decision-exact)
            — capping trips at 1 prices the hypothetical "tail solved in
            closed form" scan, i.e. the floor of the whole tail family.

Arms (fresh jax.jit per arm — the knobs are read at trace time; shared
jit would time one trace, the round-4 harness lesson), interleaved
medians, chained K=4 scans/dispatch on a real 60-s clip's phase-1 data.
Prints one self-describing JSON line.
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

    def make_arm(prefix: int, max_trips: int):
        os.environ["TAC_WF_PREFIX"] = str(prefix)
        os.environ["TAC_WF_MAX_TRIPS"] = str(max_trips)

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
        os.environ.pop("TAC_WF_PREFIX", None)
        os.environ.pop("TAC_WF_MAX_TRIPS", None)
        return fn

    # name -> (prefix, max_trips). cap* arms are floors, NOT shippable.
    grid_env = os.environ.get(
        "TAC_TAIL_GRID",
        "base:0:0,p2:2:0,p4:4:0,p8:8:0,cap1:0:1,cap4:0:4,p4cap1:4:1")
    arms = {}
    for g in grid_env.split(","):
        name, p, m = g.split(":")
        arms[name] = make_arm(int(p), int(m))

    reps = int(os.environ.get("TAC_AB_REPS", 7))
    times = {k: [] for k in arms}
    for _ in range(reps):
        for k, fn in arms.items():
            t0 = time.perf_counter()
            np.asarray(fn(smr_q))
            times[k].append((time.perf_counter() - t0) / k_chain)
    med = {k: round(float(np.median(v) * 1e3), 2) for k, v in times.items()}
    print(json.dumps({"metric": "vbr_scan_tail_probe_ms_per_scan",
                      "clip_seconds": secs, "frames": int(f),
                      "chained_k": k_chain, "reps": reps,
                      "backend": jax.default_backend(), **med}), flush=True)


if __name__ == "__main__":
    main()
