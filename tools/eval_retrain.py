"""Broad-corpus Huffman retrain evaluation (VERDICT r4 item 7).

The shipping sets 1/2 were trained on three fixed synthetic generators
(tools/train_huffman.py corpora). The 10k-clip corpus material
(tools/make_corpus.py: seeded castanets/speech/glockenspiel variants +
tonal mixes with varied levels, delays, noise floors) is the broadest
mantissa distribution this box can produce — this tool measures whether
tables retrained on it beat the shipping tables:

  1. candidate set 1: histograms over fixed-rate encodes (64/128/192
     kbps) of 16 corpus-style clips (4 kinds x 4 seeds);
     candidate set 2: block-switch encodes of the transient-heavy kinds;
  2. price HELD-OUT blocks (disjoint seeds, VBR encodes at the shipping
     preset) under min(raw, s1, s2, s3) with shipping vs candidate
     tables (set 3 fixed — it has its own distribution and protocol,
     tools/eval_tid3.py);
  3. report the mantissa-bit delta %. Swap threshold 0.3% (the tid=2
     precedent): below it, the shipping tables stand and the delta is
     recorded as the finding (format stability beats a sub-noise win).

Run: env-scrubbed CPU (see .claude/skills/verify) —
     python tools/eval_retrain.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 44100


def _corpus_clip(i: int, seconds: float = 1.5) -> np.ndarray:
    from tools import material
    from tools.make_corpus import _tonal_mix

    kind = i % 4
    if kind == 0:
        return material.castanets(FS, seconds, seed=0xCA57 + i)
    if kind == 1:
        return material.speech_like(FS, seconds, seed=0x5EEC + i)
    if kind == 2:
        return material.glockenspiel(FS, seconds, seed=0x610C + i)
    return _tonal_mix(FS, seconds, seed=0x7014 + i)


def _hist_fixed(clips) -> dict[int, np.ndarray]:
    """Set-1-style histograms: fixed-rate encodes across rates."""
    from tac import bands, codec
    from tac.config import CodecConfig

    hists = {m: np.zeros(2 ** m, np.int64) for m in range(2, 9)}
    for kbps in (64, 128, 192):
        cfg = CodecConfig(sample_rate=FS, n_channels=1,
                          bitrate_bps=kbps * 1000, use_psy=True,
                          precision="fast")
        bol = bands.band_of_line(cfg.sample_rate, cfg.n_mdct_lines)
        for clip in clips:
            code = codec.encode_clip(clip[None, :].astype(np.float32), cfg)
            alloc = np.asarray(code.alloc_code)
            alloc = np.where(alloc > 0, alloc + 1, 0)
            mant = np.asarray(code.mant)
            m_line = alloc[..., bol]
            for m in range(2, 9):
                sel = mant[m_line == m]
                if sel.size:
                    hists[m] += np.bincount(sel, minlength=2 ** m)
    return hists


def _hist_bs(clips) -> dict[int, np.ndarray]:
    """Set-2-style histograms: block-switch encodes, SHORT + transition
    frames only (the tid=2 carrier blocks) — train_huffman's set-2
    collection, over the broad clips."""
    import jax
    import jax.numpy as jnp

    from tac import bands, blockswitch as bsw
    from tac.config import CodecConfig
    from tac.dsp import mdct as fbk

    hists = {m: np.zeros(2 ** m, np.int64) for m in range(2, 9)}
    for kbps in (64, 128, 192):
        cfg = CodecConfig(sample_rate=FS, n_channels=1,
                          bitrate_bps=kbps * 1000, use_psy=True,
                          use_block_switch=True, n_mdct_lines_short=128,
                          precision="fast")
        c = bsw.make_bs_consts(cfg)
        h, hs = cfg.n_mdct_lines, cfg.n_mdct_lines_short
        bol_l = bands.band_of_line(cfg.sample_rate, h)
        bol_s = np.tile(bands.band_of_line(cfg.sample_rate, hs), h // hs)
        for clip in clips:
            x = jnp.asarray(clip[None, :], jnp.float32)
            states = np.asarray(bsw.window_states(
                bsw.transient_flags(x, cfg),
                fbk.num_frames(x.shape[-1], h)))[0]
            frames = fbk.frame_signal(x, h)[0]
            bc = jax.vmap(lambda fr, st: bsw.encode_frame_bs(
                fr, st, cfg, c))(frames, jnp.asarray(states))
            state = np.asarray(bc.state)
            for code, bol, sel in (
                    (bc.short, bol_s, state == bsw.SHORT),
                    (bc.long, bol_l,
                     (state == bsw.START) | (state == bsw.STOP))):
                if not sel.any():
                    continue
                alloc = np.asarray(code.alloc_code)[sel]
                alloc = np.where(alloc > 0, alloc + 1, 0)
                mant = np.asarray(code.mant)[sel]
                m_line = alloc[..., bol]
                for m in range(2, 9):
                    v = mant[m_line == m]
                    if v.size:
                        hists[m] += np.bincount(v, minlength=2 ** m)
    return hists


def _collect_heldout():
    """Held-out VBR blocks at the shipping preset (disjoint seeds)."""
    from tac import bands, codec
    from tac.config import CodecConfig

    out = []
    for i in range(16, 24):            # seeds disjoint from training's 0-15
        x = _corpus_clip(i)
        for bps in (96000, 128000):
            cfg = CodecConfig(sample_rate=FS, n_channels=1,
                              bitrate_bps=bps, use_psy=True,
                              use_huffman=True, precision="fast")
            bol = bands.band_of_line(cfg.sample_rate, cfg.n_mdct_lines)
            vc = codec.encode_clip_vbr(x[None, :].astype(np.float32), cfg)
            alloc = np.asarray(vc.code.alloc_code)[0]
            alloc = np.where(alloc > 0, alloc + 1, 0)
            mant = np.asarray(vc.code.mant)[0]
            out.append((mant.astype(np.int32),
                        alloc[..., bol].astype(np.int32)))
    return out


def _price(blocks, tabs) -> int:
    total = 0
    for mant, m_line in blocks:
        raw = m_line.sum(axis=-1)
        codable = (m_line >= 2) & (m_line <= 8)
        row = np.clip(m_line - 2, 0, 6)
        costs = [raw]
        for tab in tabs:
            line = tab.astype(np.int64)[row, np.clip(mant, 0, 255)]
            costs.append(np.where(codable, line, m_line).sum(axis=-1))
        total += int(np.minimum.reduce(costs).sum())
    return total


def main() -> None:
    from tac import huffman as hf
    from tools.eval_tid3 import cost_table_from
    from tools.train_huffman import train

    train_clips = [_corpus_clip(i) for i in range(16)]
    print("training candidate set 1 (fixed-rate stats)...", flush=True)
    cand1 = cost_table_from(train(_hist_fixed(train_clips)))
    print("training candidate set 2 (block-switch stats)...", flush=True)
    cand2 = cost_table_from(train(_hist_bs(train_clips)))

    print("collecting held-out blocks...", flush=True)
    blocks = _collect_heldout()
    t1, t2, t3 = (hf.cost_table_np(s) for s in (1, 2, 3))
    ship = _price(blocks, (t1, t2, t3))
    cand = _price(blocks, (cand1, cand2, t3))
    rec = {"heldout_blocks": sum(b[0].shape[0] for b in blocks),
           "shipping_bits": ship, "candidate_bits": cand,
           "candidate_saving_pct": round(100 * (ship - cand) / ship, 3),
           "swap_threshold_pct": 0.3}
    print(json.dumps(rec))
    out = os.path.join("/tmp", "retrain_eval.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
