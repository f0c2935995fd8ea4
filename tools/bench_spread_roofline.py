"""Roofline closure for the psy spread grid (VERDICT r4 item 4 — the
traversal-family question).

Round 4 measured that cutting the per-cell transcendental op count does
NOT speed the [M, H] spreading stage ("traversal-bound"). The remaining
question: is the traversal itself beatable (Pallas tiling, VMEM-resident
maskers), or is the stage already at the formulation's floor? This bench
answers with three same-process chained-dispatch arms:

  ideal   the spread+sum arithmetic ALONE on synthetic inputs — the
          exact per-cell ops of tac.psy._spread_spl + intensity sum
          ([64 tonal + 25 noise maskers] x [H lines] x rows), no
          peak-pick / DFT / band reduce around it. Any Pallas kernel
          does at least these FLOPs, so this is the floor of ANY
          reimplementation of the same math (a kernel only wins by
          removing overhead AROUND the math, which this arm has none of).
  halfM   same with half the maskers: if time halves, the stage is
          compute-throughput-bound (work-linear), i.e. only WORK
          reduction could win — and PERF.md round 3 already established
          all 64 masker slots are live on real material, while f32
          underflow-pruning can't restructure the sum without giving up
          decision-exactness.
  insitu  the production masked_threshold whole (for context: spread
          stage share per the round-3 trace is ~0.21 ms of this).

If ideal ~= the trace-measured stage cost, the book closes: the dense
spread runs at its arithmetic floor on the VPU and the next factor must
come from elsewhere. Prints one self-describing JSON line.
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

    from tac import psy
    from tac.config import PRESETS

    cfg = PRESETS["stereo44-128"]
    c = psy.make_consts(cfg)
    h = int(c.freqs.shape[0])
    rows = int(os.environ.get("TAC_ROOFLINE_ROWS", 1024))
    k_chain = int(os.environ.get("TAC_ROOFLINE_CHAIN", 8))
    kt, kn = cfg.max_maskers, 25          # tonal + noise masker counts

    rng = np.random.default_rng(0)

    def synth_inputs(m):
        lm = jnp.asarray(rng.uniform(20, 90, (rows, m)), jnp.float32)
        zm = jnp.asarray(rng.uniform(0, 25, (rows, m)), jnp.float32)
        return lm, zm

    zline = c.zline.astype(jnp.float32)

    def spread_only(lm, zm):
        """Exactly _spread_spl + masked intensity sum (per row)."""
        sp = psy._spread_spl(lm, zm, 16.0, zline)          # [m, H]
        valid = lm > 0.0
        return jnp.sum(psy.intensity_from_spl(sp) * valid[:, None], axis=0)

    def make_arm(m):
        lm, zm = synth_inputs(m)

        def chained(lm, zm):
            def body(carry, _):
                lm2 = jnp.where(carry < 0, lm + 1.0, lm)
                out = jax.vmap(spread_only)(lm2, zm)       # [rows, H]
                return jnp.sum(out).astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=k_chain)
            return s
        fn = jax.jit(chained)
        np.asarray(fn(lm, zm))                             # compile
        return lambda: np.asarray(fn(lm, zm))

    # in-situ: whole masked_threshold over the same number of rows
    frames = jnp.asarray(rng.standard_normal((rows, 2 * h)), jnp.float32)

    def insitu_chained(fr):
        def body(carry, _):
            f2 = jnp.where(carry < 0, fr + 1.0, fr)
            thr = jax.vmap(lambda r: psy.masked_threshold(r, c))(f2)
            return jnp.sum(thr).astype(jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k_chain)
        return s

    fn_insitu = jax.jit(insitu_chained)
    np.asarray(fn_insitu(frames))

    arms = {"ideal": make_arm(kt + kn),
            "halfM": make_arm((kt + kn) // 2),
            "insitu": lambda: np.asarray(fn_insitu(frames))}

    reps = int(os.environ.get("TAC_AB_REPS", 7))
    times = {k: [] for k in arms}
    for _ in range(reps):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            times[name].append((time.perf_counter() - t0) / k_chain)
    med = {k: float(np.median(v)) * 1e3 for k, v in times.items()}

    m_full = kt + kn
    cells = rows * m_full * h
    # per-cell ops in _spread_spl + intensity sum: dz, cmp, 2 (27*-dz),
    # up*dz, select, lm-delta sub, (x-96)/10 = sub+mul, exp10 = mul+exp,
    # *valid, += reduce  ->  ~12 + transcendental
    flops_est = cells * 12
    rec = {"metric": "psy_spread_roofline", "rows": rows, "h": h,
           "maskers": m_full, "chained_k": k_chain, "reps": reps,
           "backend": jax.default_backend(),
           "ideal_ms": round(med["ideal"], 3),
           "halfM_ms": round(med["halfM"], 3),
           "insitu_ms": round(med["insitu"], 3),
           "work_linearity": round(med["ideal"] / max(med["halfM"], 1e-9),
                                   2),
           "ideal_tops": round(flops_est / (med["ideal"] * 1e-3) / 1e12,
                               2)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
