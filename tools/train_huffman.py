"""Offline canonical-Huffman table trainer (SPEC.md §8).

Deterministic: fixed-seed synthetic corpus (tonal + transient + noise
material), encoded with the fixed-rate pipeline at several bitrates;
mantissa-code histograms per mantissa size m in {2..8} feed a standard
Huffman build, then canonicalization (len-major, symbol-minor). Symbols are
the 2^m raw codes plus ESCAPE (= 2^m); rare symbols (and anything that
would push max code length past MAX_LEN) collapse into ESCAPE, which emits
the raw m bits after its codeword.

Three sets (SPEC.md §8 — the full 2-bit tableId space):
  set 1 (tac/huffman_tables.json): the general corpus above;
  set 2 (tac/huffman_tables_t.json): transient/short-block statistics —
    grouped-short mantissas of SHORT frames plus the long-path mantissas
    of transient (START/SHORT/STOP) frames under the block-switch
    pipeline on attack-heavy material. Short-block mantissas concentrate
    differently (impulsive spectra -> heavier extreme-code mass), which
    is exactly what a per-block tableId exists to exploit.
  set 3 (tac/huffman_tables_s.json): side-channel / low-rate statistics —
    VBR mantissas of M/S side channels (sparse, near-threshold spectra)
    and of 48-64 kbps mono encodes. Starved allocations concentrate code
    mass near zero; tools/eval_tid3.py measured a 0.96% mantissa-bit
    saving for the 4-way min on held-out blocks (above the 0.3% wire-in
    threshold derived from the tid=2 precedent), which is why the last
    tableId value is spent here (VERDICT r4 item 6).

Run: python tools/train_huffman.py [--set 1|2|3|all]  (default: all)
"""

from __future__ import annotations

import heapq
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_LEN = 16
ESCAPE_MIN_FREQ = 1e-5          # symbols rarer than this (relative) escape


def corpus(fs: int = 44100, seconds: float = 4.0) -> list[np.ndarray]:
    rng = np.random.default_rng(422)
    t = np.arange(int(fs * seconds)) / fs
    clips = []
    # tonal: harmonic stacks
    for f0 in (110.0, 262.0, 440.0, 880.0):
        sig = sum(0.5 / k * np.sin(2 * np.pi * f0 * k * t) for k in range(1, 8))
        clips.append(0.5 * sig / np.max(np.abs(sig)))
    # noise-like
    clips.append(0.3 * rng.standard_normal(len(t)))
    # filtered noise (pink-ish via cumsum + HPF)
    p = np.cumsum(rng.standard_normal(len(t)))
    p = p - np.convolve(p, np.ones(512) / 512, "same")
    clips.append(0.3 * p / np.max(np.abs(p)))
    # transients: decaying impulses
    imp = np.zeros(len(t))
    for i in range(8):
        k = int(fs * seconds * (i + 0.3) / 9)
        imp[k:k + 2000] += np.exp(-np.arange(2000) / 300.0) \
            * np.sin(2 * np.pi * 1500 * np.arange(2000) / fs)
    clips.append(0.6 * imp / np.max(np.abs(imp)))
    return clips


def collect_histograms() -> dict[int, np.ndarray]:
    from tac import bands, codec
    from tac.config import CodecConfig

    hists = {m: np.zeros(2 ** m, np.int64) for m in range(2, 9)}
    for kbps in (64, 96, 128, 192):
        cfg = CodecConfig(sample_rate=44100, n_channels=1,
                          bitrate_bps=kbps * 1000, use_psy=True,
                          precision="fast")
        bol = bands.band_of_line(cfg.sample_rate, cfg.n_mdct_lines)
        for clip in corpus():
            code = codec.encode_clip(clip[None, :], cfg)
            alloc = np.asarray(code.alloc_code)          # [C, F, B]
            alloc = np.where(alloc > 0, alloc + 1, 0)
            mant = np.asarray(code.mant)                 # [C, F, H]
            m_line = alloc[..., bol]                     # [C, F, H]
            for m in range(2, 9):
                sel = mant[m_line == m]
                if sel.size:
                    hists[m] += np.bincount(sel, minlength=2 ** m)
    return hists


def corpus_transient(fs: int = 44100, seconds: float = 4.0
                     ) -> list[np.ndarray]:
    """Attack-heavy material for the set-2 statistics: impulse trains of
    varying density/brightness, castanet-style strikes, noise bursts."""
    rng = np.random.default_rng(4222)
    t = np.arange(int(fs * seconds)) / fs
    clips = []
    for rate, f0, decay in ((6, 1500.0, 300.0), (11, 2800.0, 80.0),
                            (17, 900.0, 150.0)):
        imp = np.zeros(len(t))
        for i in range(int(seconds * rate)):
            k = int(fs * (i + 0.31) / rate)
            if k + 2000 > len(t):
                break
            ph = 2 * np.pi * f0 * np.arange(2000) / fs
            imp[k:k + 2000] += np.exp(-np.arange(2000) / decay) * np.sin(ph)
        clips.append(0.6 * imp / max(np.max(np.abs(imp)), 1e-9))
    # noise bursts (drum-ish): shaped noise with sharp onsets
    b = np.zeros(len(t))
    for i in range(int(seconds * 8)):
        k = int(fs * (i + 0.47) / 8)
        if k + 3000 > len(t):
            break
        b[k:k + 3000] += (np.exp(-np.arange(3000) / 400.0)
                          * rng.standard_normal(3000))
    clips.append(0.5 * b / max(np.max(np.abs(b)), 1e-9))
    # strike + tonal bed (mixed frames exercise START/STOP states)
    bed = 0.2 * np.sin(2 * np.pi * 330 * t)
    clips.append(np.clip(bed + 0.8 * clips[0], -0.99, 0.99))
    return clips


def collect_histograms_transient() -> dict[int, np.ndarray]:
    """Set-2 histograms: block-switch encodes of transient material;
    SHORT frames contribute their grouped-short mantissas, START/STOP
    frames their long-path mantissas (the codes tid=2 would actually
    carry under SPEC §9 serialization)."""
    import jax
    import jax.numpy as jnp

    from tac import bands, blockswitch as bsw
    from tac.config import CodecConfig

    hists = {m: np.zeros(2 ** m, np.int64) for m in range(2, 9)}
    for kbps in (64, 96, 128, 192):
        cfg = CodecConfig(sample_rate=44100, n_channels=1,
                          bitrate_bps=kbps * 1000, use_psy=True,
                          use_block_switch=True, n_mdct_lines_short=128,
                          precision="fast")
        c = bsw.make_bs_consts(cfg)
        h, hs = cfg.n_mdct_lines, cfg.n_mdct_lines_short
        bol_l = bands.band_of_line(cfg.sample_rate, h)
        bol_s = np.tile(bands.band_of_line(cfg.sample_rate, hs), h // hs)
        from tac.dsp import mdct as fb
        for clip in corpus_transient():
            x = jnp.asarray(clip[None, :], jnp.float32)
            states = np.asarray(bsw.window_states(
                bsw.transient_flags(x, cfg),
                fb.num_frames(x.shape[-1], h)))[0]
            frames = fb.frame_signal(x, h)[0]
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


def side_lowrate_sources(fs: int = 44100, seconds: float = 1.5):
    """(mono_signal, bitrate_bps) pairs carrying set-3 statistics: M/S side
    channels at the rate the joint allocator typically grants them, mids,
    and low-rate mono encodes. Mirrors tools/eval_tid3.py's block_sources
    (the measurement that justified wiring tid=3) but over its FULL clip
    set — the shipping table trains on everything; eval_tid3 keeps the
    train/test split for the held-out-saving measurement."""
    import jax.numpy as jnp

    from tac.codec import ms_forward
    from tools import material
    from tools.make_corpus import _tonal_mix

    casts = material.castanets(fs, seconds)
    speech = material.speech_like(fs, seconds)
    glock = material.glockenspiel(fs, seconds)
    mixes = [_tonal_mix(fs, seconds, seed=7000 + i) for i in range(4)]
    rng = np.random.default_rng(99)
    for base in (casts, speech, glock, *mixes):
        r = 0.8 * np.roll(base, int(rng.integers(8, 200)))
        r = r + 0.01 * rng.standard_normal(len(base))
        ms = np.asarray(ms_forward(jnp.asarray(np.stack([base, r]),
                                               jnp.float32)))
        yield ms[1], 48000          # side channel
        yield ms[0], 80000          # mid at its joint-alloc share
    for m in (casts, speech, glock, *mixes):
        yield m, 48000
        yield m, 64000


def collect_histograms_side() -> dict[int, np.ndarray]:
    """Set-3 histograms: VBR encodes of side/low-rate material — the codes
    tid=3 would actually carry (reservoir-fed allocations, not fixed-rate),
    collected under the shipping 3-way pricing."""
    from tac import bands, codec
    from tac.config import CodecConfig

    hists = {m: np.zeros(2 ** m, np.int64) for m in range(2, 9)}
    for x, bps in side_lowrate_sources():
        cfg = CodecConfig(sample_rate=44100, n_channels=1, bitrate_bps=bps,
                          use_psy=True, use_huffman=True, huffman_sets=2,
                          precision="fast")
        bol = bands.band_of_line(cfg.sample_rate, cfg.n_mdct_lines)
        vc = codec.encode_clip_vbr(x[None, :].astype(np.float32), cfg)
        alloc = np.asarray(vc.code.alloc_code)[0]
        alloc = np.where(alloc > 0, alloc + 1, 0)
        mant = np.asarray(vc.code.mant)[0]
        m_line = alloc[..., bol]
        for m in range(2, 9):
            sel = mant[m_line == m]
            if sel.size:
                hists[m] += np.bincount(sel, minlength=2 ** m)
    return hists


def build_canonical(freq: np.ndarray) -> tuple[list[int], list[int]]:
    """freq over syms 0..2^m (last = ESCAPE) → canonical (lengths, codes)."""
    n = len(freq)
    # Huffman lengths via heap of (freq, tiebreak, node)
    heap = [(int(f), i, i) for i, f in enumerate(freq) if f > 0]
    if len(heap) == 1:
        lengths = [0] * n
        lengths[heap[0][2]] = 1
        return lengths, assign_codes(lengths)
    heapq.heapify(heap)
    parent: dict[int, int] = {}
    nxt = n
    while len(heap) > 1:
        f1, _, a = heapq.heappop(heap)
        f2, _, b = heapq.heappop(heap)
        parent[a] = nxt
        parent[b] = nxt
        heapq.heappush(heap, (f1 + f2, nxt, nxt))
        nxt += 1
    lengths = [0] * n
    for i in range(n):
        if freq[i] > 0:
            d, j = 0, i
            while j in parent:
                j = parent[j]
                d += 1
            lengths[i] = d
    return lengths, assign_codes(lengths)


def assign_codes(lengths: list[int]) -> list[int]:
    """Canonical code assignment: shorter first, then symbol order."""
    order = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = [0] * len(lengths)
    code, prev_len = 0, 0
    for l, s in order:
        code <<= (l - prev_len)
        codes[s] = code
        code += 1
        prev_len = l
    return codes


def train(hists: dict | None = None) -> dict:
    if hists is None:
        hists = collect_histograms()
    tables = {}
    for m in range(2, 9):
        h = hists[m].astype(np.float64)
        total = max(h.sum(), 1.0)
        keep = h / total >= ESCAPE_MIN_FREQ
        esc_freq = h[~keep].sum() + 1.0          # escape always representable
        freq = np.concatenate([np.where(keep, h, 0.0), [esc_freq]])
        lengths, codes = build_canonical(freq)
        while max(lengths) > MAX_LEN:            # flatten tail into escape
            thresh = np.partition(freq[freq > 0], 8)[8]
            drop = (freq[:-1] > 0) & (freq[:-1] <= thresh)
            freq[-1] += freq[:-1][drop].sum()
            freq[:-1][drop] = 0.0
            lengths, codes = build_canonical(freq)
        tables[str(m)] = {"lengths": lengths, "codes": codes}
        kept = sum(1 for l in lengths[:-1] if l)
        bits = np.where(np.array(lengths[:-1]) > 0,
                        np.array(lengths[:-1]), lengths[-1] + m)
        avg = float((h * bits).sum() / total)
        print(f"m={m}: {kept}/{2**m} kept, maxlen={max(lengths)}, "
              f"avg {avg:.2f} vs raw {m} bits")
    return tables


if __name__ == "__main__":
    which = "all"
    for a in sys.argv[1:]:
        if a.startswith("--set"):
            which = a.split("=", 1)[1] if "=" in a \
                else sys.argv[sys.argv.index(a) + 1]
    tac_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tac")
    if which in ("1", "all"):
        out = os.path.join(tac_dir, "huffman_tables.json")
        with open(out, "w") as f:
            json.dump(train(), f)
        print("wrote", out)
    if which in ("2", "all"):
        out = os.path.join(tac_dir, "huffman_tables_t.json")
        with open(out, "w") as f:
            json.dump(train(collect_histograms_transient()), f)
        print("wrote", out)
    if which in ("3", "all"):
        out = os.path.join(tac_dir, "huffman_tables_s.json")
        with open(out, "w") as f:
            json.dump(train(collect_histograms_side()), f)
        print("wrote", out)
