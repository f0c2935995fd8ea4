"""Measure the quality-contract quantities (VERDICT r3 item 9).

Prints the measured values behind tests/test_quality.py's floors so they
can be tightened to measured-minus-margin after a stable round:
  - SNR for every (material, preset) CASES row,
  - the NMR distribution (median / p90 / worst allocated cell / worst
    empty band) of test_noise_below_masked_threshold.

Run on the CPU backend (the suite's backend):
  env TAC_TEST_REEXECED=1 PYTHONPATH=/root/repo PALLAS_AXON_POOL_IPS= \
      JAX_PLATFORMS=cpu python tools/measure_quality.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tac import api
    from tac.config import PRESETS
    from tools.material import castanets, glockenspiel, speech_like

    fs = 44100
    mats = {"castanets": castanets(fs), "speech": speech_like(fs),
            "glockenspiel": glockenspiel(fs)}

    def snr(x, y):
        y = y[: len(x), 0]
        return 10 * np.log10(np.mean(x ** 2)
                             / max(np.mean((x - y) ** 2), 1e-30))

    cases = [("castanets", "stereo44-128"), ("speech", "stereo44-128"),
             ("glockenspiel", "stereo44-128"), ("speech", "vbr-huffman"),
             ("castanets", "vbr-bs"), ("speech", "vbr-bs"),
             ("glockenspiel", "streaming-ll")]
    out = {}
    for mat, preset in cases:
        cfg = PRESETS[preset]
        if cfg.n_channels != 1:
            cfg = cfg.replace(n_channels=1)
        y, _ = api.decode_array(api.encode_array(mats[mat], cfg))
        out[f"{mat}/{preset}"] = round(float(snr(mats[mat], y)), 2)
        print(json.dumps({f"{mat}/{preset}": out[f"{mat}/{preset}"]}),
              flush=True)

    # NMR distribution (mirrors test_noise_below_masked_threshold exactly)
    import jax
    import jax.numpy as jnp

    from tac import bands, codec
    from tac.dsp import mdct as fb
    from tac.psy import masked_threshold
    from tools import material

    cfg = PRESETS["stereo44-128"].replace(n_channels=1)
    x = material.glockenspiel(cfg.sample_rate, 2.0).astype(np.float64)
    y = api.decode_array(api.encode_array(x, cfg),
                         precision="fast")[0][:, 0]
    n = min(len(x), len(y))
    e = x[:n] - y[:n].astype(np.float64)
    c = codec.make_consts(cfg)
    h = cfg.n_mdct_lines
    fx = fb.frame_signal(jnp.asarray(x[None, :n]), h)[0]
    fe = fb.frame_signal(jnp.asarray(e[None, :n]), h)[0]
    alloc = np.asarray(codec.ba.code_to_alloc(
        codec.encode_clip(jnp.asarray(x[None, :n]), cfg).alloc_code))[0]
    thr_i = np.asarray(jax.vmap(
        lambda fr: masked_threshold(fr.astype(jnp.float32), c.psy))(fx))
    lines_e = np.asarray(jax.vmap(
        lambda fr: jnp.dot(fr.astype(c.dtype), c.fwd_basis))(fe))
    noise_i = c.mdct_gain * lines_e ** 2
    bol = np.asarray(c.band_of_line)
    bsum = lambda a: np.stack(
        [a[:, bol == b].sum(1) if (bol == b).any() else np.zeros(len(a))
         for b in range(bands.N_BANDS)], axis=1)
    nmr = 10 * np.log10(np.maximum(bsum(noise_i), 1e-30)
                        / np.maximum(bsum(thr_i), 1e-30))
    interior = slice(4, -4)
    got = (alloc[interior] > 0)
    vals = nmr[interior][got]
    empty = (alloc[interior] == 0) & (np.asarray(c.n_lines) > 0)[None, :]
    out["nmr"] = {"median": round(float(np.median(vals)), 2),
                  "p90": round(float(np.percentile(vals, 90)), 2),
                  "worst": round(float(vals.max()), 2),
                  "empty_worst": round(float(nmr[interior][empty].max()), 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
