"""Pallas TPU kernel: canonical-Huffman mantissa decode, LUT-free.

Why: VBR/combo device decode is capped by the serial canonical decode
walk (codec._huffman_decode_scan) — a lax.scan over the line axis whose
step chains one 13-bit peek, one packed-LUT gather and one escape read
through `pos`; ~5 dependent [K]-wide gathers per step x H steps kept
VBR decode at ~157 audio-sec/s device while raw decode runs ~590
(PERF.md). This kernel runs the whole walk on-chip with rows laid out
across the vector tile ([8, 128] = 1024 rows per grid step) and NO
table memory at all:

  * the two-word window fetch is a select-accumulate over the static
    word axis with clip-to-last-word semantics (the read_fields lesson);
    every in-step bit read (13-bit peek + escape/raw field, <= 29 bits
    total) comes out of that one 32-bit window;
  * codeword length + symbol come from canonical-code ARITHMETIC instead
    of a LUT: for each (table m, length l) group the codes are a
    contiguous ascending range [first, last] (canonical property,
    asserted at build), so  hit = (v_l in range)  gives the length and
    rank = v_l - first + base; the rank -> symbol permutation is
    run-decomposed (tac.huffman.run_decompose — 128 runs across all
    seven trained tables), so the lookup is a compare-accumulate chain.

Decision parity: line-exact vs codec._huffman_decode_scan for every
valid stream, including ln == 0 stalls on uncovered peeks (asserted in
tests/test_pallas_huffdec.py interpret-mode and on-chip by the device
decode suites). On corrupt rows whose walk runs past the payload the
clipped-word reads may differ from the XLA scan's — both are discarded
garbage (the tid mask selects raw) or typed-error paths upstream.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tac import huffman as hf

ROWS_SUB, ROWS_LANE = 8, 128          # rows per grid step = 8 * 128
HB = 128                              # lines per grid step


@functools.lru_cache(maxsize=4)
def _canon_consts(set_id: int = 1):
    """Static decode constants from the trained tables (per table set).

    Returns (pairs, perm_runs, escs) where
      pairs: [(m, l, first, last, base)] — codes of length l in table m
             span [first, last] with canonical ranks starting at base;
      perm_runs: {m: (c0, runs)} — run decomposition of
             perm[rank] - rank (perm = symbols in canonical order);
      escs: {m: escape symbol value}.
    Raises ValueError if a table is not canonical-contiguous (the caller
    falls back to the XLA LUT scan).
    """
    tabs = hf.load_tables(set_id)
    pairs, perm_runs, escs = [], {}, {}
    for m in range(hf.MIN_M, hf.MAX_M + 1):
        lens, codes = tabs[m]["lengths"], tabs[m]["codes"]
        lmax = int(max(lens))
        base = 0
        perm = []
        for l in range(1, lmax + 1):
            syms = np.flatnonzero(lens == l)
            if len(syms) == 0:
                continue
            cs = codes[syms]
            order = np.argsort(cs)
            first, last = int(cs.min()), int(cs.max())
            if not (np.array_equal(np.sort(cs),
                                   np.arange(first, first + len(cs)))
                    and np.array_equal(syms[order], np.sort(syms))):
                raise ValueError(
                    f"huffman table m={m} is not canonical-contiguous")
            pairs.append((m, l, first, last, base))
            base += len(syms)
            perm.extend(syms[order].tolist())
        d = np.asarray(perm, np.int64) - np.arange(len(perm))
        perm_runs[m] = hf.run_decompose(d)
        escs[m] = 1 << m
    return pairs, perm_runs, escs


def _kernel(wordsT_ref, mstart_ref, m_ref, out_ref, pos_scr, *, w32: int,
            set_id: int = 1):
    pairs, perm_runs, escs = _canon_consts(set_id)
    hb = pl.program_id(1)

    @pl.when(hb == 0)
    def _init():
        pos_scr[:] = mstart_ref[0]

    def step(j, pos):
        m = m_ref[0, j]                                  # [8, 128] i32
        codable = (m >= hf.MIN_M) & (m <= hf.MAX_M)

        # two-word window at pos, clip-to-last-word (read_fields semantics)
        w0 = pos >> 5
        r = (pos & 31).astype(jnp.uint32)
        last = wordsT_ref[0, w32 - 1]
        hi = last
        lo = last
        for w in range(w32):
            cur = wordsT_ref[0, w]
            hi = jnp.where(w0 == w, cur, hi)
            lo = jnp.where(w0 == w - 1, cur, lo)
        merged = (hi << r) | jnp.where(r > 0, lo >> (32 - r),
                                       jnp.uint32(0))    # bits [pos, pos+32)

        # canonical length + rank (at most one hit per row: prefix-free)
        ln = jnp.zeros(m.shape, jnp.int32)
        rank = jnp.zeros(m.shape, jnp.int32)
        for mm, l, first, lastc, base in pairs:
            v = (merged >> jnp.uint32(32 - l)).astype(jnp.int32)
            hit = (m == mm) & (v >= first) & (v <= lastc)
            ln = jnp.where(hit, l, ln)
            rank = jnp.where(hit, v - first + base, rank)

        # rank -> symbol (per-table run-decomposed permutation)
        off = jnp.zeros(m.shape, jnp.int32)
        esc_sym = jnp.zeros(m.shape, jnp.int32)
        for mm in range(hf.MIN_M, hf.MAX_M + 1):
            c0, runs = perm_runs[mm]
            off = jnp.where(m == mm, hf._apply_runs(rank, c0, runs), off)
            esc_sym = jnp.where(m == mm, escs[mm], esc_sym)
        sym = jnp.where(ln > 0, rank + off, 0)           # uncovered peek -> 0

        esc = codable & (sym == esc_sym)
        code_bits = jnp.where(codable, ln, 0)
        raw_bits = jnp.where(codable, jnp.where(esc, m, 0), m)
        # escape/raw field sits inside the same window: cb + rb <= 29 < 32
        m2 = merged << code_bits.astype(jnp.uint32)
        rawv = jnp.where(raw_bits > 0,
                         m2 >> (32 - raw_bits).astype(jnp.uint32),
                         jnp.uint32(0)).astype(jnp.int32)
        val = jnp.where(codable & ~esc, sym, rawv)
        out_ref[0, j] = val
        return pos + code_bits + raw_bits

    pos_scr[:] = jax.lax.fori_loop(0, m_ref.shape[1], step, pos_scr[:])


@functools.partial(jax.jit, static_argnames=("interpret", "set_id"))
def huffman_decode_rows(words, mant_start, m_line, *, interpret=False,
                        set_id: int = 1):
    """Device canonical-Huffman decode of all rows' mantissa runs.

    words: uint32[K, W32]; mant_start: int32[K]; m_line: int32[K, H].
    Returns int32[K, H] — line-exact vs codec._huffman_decode_scan on
    valid streams. H must be a multiple of 128 (all long-block configs).
    set_id picks the trained table set (SPEC.md §8 tableId 1/2).
    """
    k, w32 = words.shape
    h = m_line.shape[1]
    rows = ROWS_SUB * ROWS_LANE
    hb = HB if h % HB == 0 else h
    g = -(-k // rows)
    kp = g * rows

    wp = jnp.zeros((kp, w32), jnp.uint32).at[:k].set(
        words.astype(jnp.uint32))
    wordsT = wp.reshape(g, ROWS_SUB, ROWS_LANE, w32).transpose(0, 3, 1, 2)
    mp = jnp.zeros((kp, h), jnp.int32).at[:k].set(
        m_line.astype(jnp.int32))
    mT = mp.reshape(g, ROWS_SUB, ROWS_LANE, h).transpose(0, 3, 1, 2)
    sp = jnp.zeros((kp,), jnp.int32).at[:k].set(
        mant_start.astype(jnp.int32))
    sT = sp.reshape(g, ROWS_SUB, ROWS_LANE)

    out = pl.pallas_call(
        functools.partial(_kernel, w32=w32, set_id=set_id),
        out_shape=jax.ShapeDtypeStruct((g, h, ROWS_SUB, ROWS_LANE),
                                       jnp.int32),
        grid=(g, h // hb),
        in_specs=[
            pl.BlockSpec((1, w32, ROWS_SUB, ROWS_LANE),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_SUB, ROWS_LANE), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, ROWS_SUB, ROWS_LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, ROWS_SUB, ROWS_LANE),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROWS_SUB, ROWS_LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(wordsT, sT, mT)
    return out.transpose(0, 2, 3, 1).reshape(kp, h)[:k]
