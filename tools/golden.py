"""Golden-vector parity harness (SURVEY.md §4 item 1).

Generates (or checks) SHA-256 digests of the .pac streams produced by the
parity-mode encoder on deterministic test material, one per evaluation
config. The committed digests (goldens/streams.json) pin the bitstream
format across refactors and build rounds: any change to quantization,
allocation, psy decisions, serialization, or the Huffman tables shows up
as a digest mismatch in tests/test_golden.py.

Run: python tools/golden.py gen    (regenerate after an INTENTIONAL format
                                    change — document why in the commit)
     python tools/golden.py check
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens", "streams.json")


def clips() -> dict[str, tuple[np.ndarray, int]]:
    """Deterministic test material per config family."""
    rng = np.random.default_rng(20260816)
    out = {}

    fs = 16000
    t = np.arange(fs // 2) / fs
    mono = (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sin(2 * np.pi * 3000 * t)
            + 0.01 * rng.standard_normal(len(t)))
    out["mono16"] = (mono[:, None], fs)

    fs = 44100
    t = np.arange(fs // 2) / fs
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.43, 440), (0.24, 554), (0.15, 660),
                           (0.12, 880), (0.05, 4400), (0.03, 8800)])
    stereo = np.stack([sig, 0.8 * sig + 0.02 * rng.standard_normal(len(t))],
                      1)
    out["stereo44"] = (stereo, fs)

    x = 0.3 * np.sin(2 * np.pi * 440 * t)
    x[len(t) // 3:len(t) // 3 + 800] += 0.6 * np.exp(
        -np.arange(800) / 100.0) * np.sin(2 * np.pi * 3000 * np.arange(800) / fs)
    out["transient44"] = (x[:, None], fs)

    # correlated stereo with a common transient (ms x blockswitch)
    side = (0.05 * np.sin(2 * np.pi * 550 * t)
            + 0.01 * rng.standard_normal(len(t)))
    out["transient44_stereo"] = (np.stack([x + side, x - side], 1), fs)
    return out


def cases():
    from tac.config import PRESETS

    material = clips()
    yield "config1_mono16_64", PRESETS["mono16-64"], material["mono16"]
    yield ("config2_stereo44_128",
           PRESETS["stereo44-128"].replace(precision="parity"),
           material["stereo44"])
    yield ("config3_vbr_huffman",
           PRESETS["vbr-huffman"].replace(precision="parity"),
           material["stereo44"])
    yield ("config5_blockswitch",
           PRESETS["streaming-ll"].replace(precision="parity"),
           material["transient44"])
    yield ("config6_vbr_blockswitch",
           PRESETS["vbr-bs"].replace(precision="parity", n_mdct_lines=256,
                                     n_mdct_lines_short=64, n_channels=1),
           material["transient44"])
    yield ("config7_ms_stereo",
           PRESETS["stereo44-128-ms"].replace(precision="parity"),
           material["stereo44"])
    yield ("config8_ms_vbr",
           PRESETS["vbr-ms"].replace(precision="parity"),
           material["stereo44"])
    yield ("config9_ms_blockswitch",
           PRESETS["ms-bs"].replace(precision="parity", n_mdct_lines=256,
                                    n_mdct_lines_short=64),
           material["transient44_stereo"])
    yield ("config10_ms_vbr_blockswitch",
           PRESETS["vbr-ms-bs"].replace(precision="parity",
                                        n_mdct_lines=256,
                                        n_mdct_lines_short=64),
           material["transient44_stereo"])


def digests() -> dict[str, dict]:
    import jax
    jax.config.update("jax_enable_x64", True)   # parity precision is f64

    from tac import api

    out = {}
    for name, cfg, (x, fs) in cases():
        cfg = cfg.replace(sample_rate=fs)
        data = api.encode_array(x, cfg)
        out[name] = {"sha256": hashlib.sha256(data).hexdigest(),
                     "bytes": len(data)}
    return out


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    got = digests()
    if mode == "gen":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1)
        print("wrote", GOLDEN_PATH)
        for k, v in got.items():
            print(f"  {k}: {v['bytes']}B {v['sha256'][:16]}…")
        return 0
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    bad = [k for k in want if got.get(k) != want[k]]
    for k in bad:
        print(f"MISMATCH {k}: want {want[k]} got {got.get(k)}")
    print("golden check:", "FAIL" if bad else "OK", f"({len(want)} streams)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
