"""Measure the fused Pallas MDCT kernel vs the jnp matmul fast path on the
live backend (VERDICT r1 item 6: gate the kernel on a real number).

Both paths compute frame_signal(x, h) @ basis (window fused into the
basis). Prints one JSON line with ms per call and the speedup.

Run on the real chip:  python tools/bench_pallas_mdct.py
(first compile over the remote tunnel is slow; the compile cache in
.jax_cache makes re-runs fast)."""

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

    from tac.dsp import mdct as fb
    from tac.dsp.window import window_fn
    from tac.ops.pallas_mdct import mdct_frames_pallas

    h = int(os.environ.get("H", 1024))
    seconds = float(os.environ.get("SECONDS", 30))
    c = 2
    fs = 44100
    t = int(fs * seconds)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
    basis = jnp.asarray(fb.mdct_basis(h, window_fn("sine", 2 * h, 4.0),
                                      np.float64), jnp.float32)

    @jax.jit
    def matmul_path(x):
        fr = fb.frame_signal(x, h)
        return jnp.dot(fr, basis, preferred_element_type=jnp.float32)

    @jax.jit
    def pallas_path(x):
        return mdct_frames_pallas(x, h, basis)

    ym = matmul_path(x)
    yp = pallas_path(x)
    jax.block_until_ready((ym, yp))
    err = float(jnp.max(jnp.abs(ym - yp)))
    scale = float(jnp.max(jnp.abs(ym)))

    def timeit(f, iters=20):
        f(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters * 1e3

    ms_m = timeit(matmul_path)
    ms_p = timeit(pallas_path)
    print(json.dumps({
        "backend": jax.default_backend(),
        "h": h, "frames": int(ym.shape[1]), "channels": c,
        "matmul_ms": round(ms_m, 3), "pallas_ms": round(ms_p, 3),
        "pallas_speedup": round(ms_m / ms_p, 3),
        "max_abs_err": err, "rel_err": err / scale,
    }))


if __name__ == "__main__":
    main()
