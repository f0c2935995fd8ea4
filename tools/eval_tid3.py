"""Decide tableId=3 (SPEC.md §8's last dangling value — VERDICT r4 item 6).

Hypothesis: the M/S side channel and low-rate streams have mantissa
statistics different enough from sets 1/2 that a dedicated trained set
would win the per-block min. Measurement:

  1. collect per-block (mant, m_line) from VBR encodes of
     side-channel material (ms_forward of stereo pairs, encoded at the
     side's typical rate) and low-rate mono encodes (48/64 kbps);
  2. train a CANDIDATE set 3 on half the clips (train/test split);
  3. on held-out blocks, price every block under the shipping 3-way min
     (raw/set1/set2) and under a 4-way min adding the candidate;
  4. report the mantissa-bit saving %. The wire-in threshold is 0.3%
     (the tid=2 set measured 0.31% direct entropy saving and that
     converted to +0.7-0.9 dB via the reservoir, PERF.md round 4);
     below it, SPEC §8 formally reserves tid=3 with this number.

Run: env-scrubbed CPU (see .claude/skills/verify) —
     python tools/eval_tid3.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 44100


def block_sources():
    """Yields (tag, mono_signal, bitrate_bps) for encode_clip_vbr."""
    from tools import material
    from tools.make_corpus import _tonal_mix

    casts = material.castanets(FS, 1.5)
    speech = material.speech_like(FS, 1.5)
    glock = material.glockenspiel(FS, 1.5)
    mixes = [_tonal_mix(FS, 1.5, seed=7000 + i) for i in range(4)]
    stereo_pairs = []
    rng = np.random.default_rng(99)
    for base in (casts, speech, glock, *mixes):
        # realistic stereo: level-imbalanced, delayed, noise-decorrelated
        r = 0.8 * np.roll(base, int(rng.integers(8, 200)))
        r = r + 0.01 * rng.standard_normal(len(base))
        stereo_pairs.append(np.stack([base, r]))
    for i, pair in enumerate(stereo_pairs):
        from tac.codec import ms_forward
        import jax.numpy as jnp
        ms = np.asarray(ms_forward(jnp.asarray(pair, jnp.float32)))
        # side channel at the rate the joint allocator typically grants it
        yield f"side{i}", ms[1], 48000
        yield f"mid{i}", ms[0], 80000
    for i, m in enumerate((casts, speech, glock, *mixes)):
        yield f"low48_{i}", m, 48000
        yield f"low64_{i}", m, 64000


def collect_blocks():
    """Returns list of (tag, mant[F, H] int32, m_line[F, H] int32)."""
    from tac import bands, codec
    from tac.config import CodecConfig

    out = []
    for tag, x, bps in block_sources():
        cfg = CodecConfig(sample_rate=FS, n_channels=1, bitrate_bps=bps,
                          use_psy=True, use_huffman=True, precision="fast")
        bol = bands.band_of_line(cfg.sample_rate, cfg.n_mdct_lines)
        vc = codec.encode_clip_vbr(x[None, :].astype(np.float32), cfg)
        alloc = np.asarray(vc.code.alloc_code)[0]          # [F, B]
        alloc = np.where(alloc > 0, alloc + 1, 0)
        mant = np.asarray(vc.code.mant)[0]                 # [F, H]
        out.append((tag, mant.astype(np.int32),
                    alloc[..., bol].astype(np.int32)))
        print(f"collected {tag}: {mant.shape[0]} frames", flush=True)
    return out


def hists_from(blocks):
    hists = {m: np.zeros(2 ** m, np.int64) for m in range(2, 9)}
    for _, mant, m_line in blocks:
        for m in range(2, 9):
            sel = mant[m_line == m]
            if sel.size:
                hists[m] += np.bincount(sel, minlength=2 ** m)
    return hists


def cost_table_from(tables: dict) -> np.ndarray:
    """[7, 256] effective-bits table from a trained dict (same convention
    as tac.huffman.cost_table_np)."""
    out = np.zeros((7, 256), np.int32)
    for m in range(2, 9):
        t = tables[str(m)]
        lens = np.asarray(t["lengths"], np.int64)
        esc = lens[-1] + m
        row = np.where(lens[:-1] > 0, lens[:-1], esc)
        out[m - 2, : 2 ** m] = row
    return out


def price_blocks(blocks, cost_tabs):
    """Per-frame block cost under min(raw, *tables). Returns (total_min,
    per_tab_totals) summed over all frames."""
    total = 0
    for _, mant, m_line in blocks:
        raw = m_line.sum(axis=-1)                          # [F]
        costs = [raw]
        codable = (m_line >= 2) & (m_line <= 8)
        row = np.clip(m_line - 2, 0, 6)
        for tab in cost_tabs:
            line = tab[row, np.clip(mant, 0, 255)]
            costs.append(np.where(codable, line, m_line).sum(axis=-1))
        total += np.minimum.reduce(costs).sum()
    return int(total)


def main() -> None:
    from tac import huffman as hf
    from tools.train_huffman import train

    blocks = collect_blocks()
    train_b = blocks[0::2]
    test_b = blocks[1::2]

    cand = train(hists_from(train_b))
    t1 = hf.cost_table_np(1)
    t2 = hf.cost_table_np(2)
    t3 = cost_table_from(cand)

    three = price_blocks(test_b, (t1, t2))
    four = price_blocks(test_b, (t1, t2, t3))
    raw_only = price_blocks(test_b, ())
    rec = {"test_blocks": sum(b[1].shape[0] for b in test_b),
           "raw_bits": raw_only,
           "threeway_bits": three,
           "fourway_bits": four,
           "saving_pct_vs_threeway": round(100 * (three - four) / three, 3),
           "wire_threshold_pct": 0.3}
    print(json.dumps(rec))
    out = os.path.join("/tmp", "tid3_eval.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
