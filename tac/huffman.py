"""Huffman entropy coding for mantissas (SPEC.md §8; SURVEY.md §2 #11).

TPU-native split (SURVEY.md §7 step 9): the *decision* side (per-symbol bit
costs, raw-vs-Huffman choice, bit-reservoir arithmetic) runs on device as
table gathers inside the jitted encode scan; the *serialization* side
(codeword emission, canonical table walk on decode) runs host-side,
vectorized with numpy where offsets are static and a small LUT walk where
they are data-dependent.

Tables: canonical, trained offline by tools/train_huffman.py. THREE
trained sets fill the 2-bit tableId space (SPEC.md §8): set 1
(tac/huffman_tables.json, general/tonal statistics), set 2
(tac/huffman_tables_t.json, transient/short-block statistics), and set 3
(tac/huffman_tables_s.json, M/S-side-channel / low-rate statistics —
the last reserved tid value, wired after tools/eval_tid3.py measured a
0.96% held-out mantissa-bit saving for the 4-way min, VERDICT r4 item
6). Symbols = raw m-bit mantissa codes + ESCAPE (= 2^m); escape emits
the raw m bits after its codeword. tableId per block per channel: 0 =
raw, 1/2/3 = trained sets. Every table accessor below takes `set_id`
(default 1, the round-1..3 behavior).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

MIN_M, MAX_M = 2, 8          # Huffman-codable mantissa sizes
_DIR = os.path.dirname(__file__)
TABLES_PATH = os.path.join(_DIR, "huffman_tables.json")
SET_PATHS = {1: TABLES_PATH,
             2: os.path.join(_DIR, "huffman_tables_t.json"),
             3: os.path.join(_DIR, "huffman_tables_s.json")}


def n_sets() -> int:
    """Contiguous trained table sets available on disk (2/3 optional)."""
    n = 1
    while n + 1 in SET_PATHS and os.path.exists(SET_PATHS[n + 1]):
        n += 1
    return n


@lru_cache(maxsize=4)
def load_tables(set_id: int = 1) -> dict[int, dict[str, np.ndarray]]:
    """{m: {lengths[2^m + 1], codes[2^m + 1]}} (last symbol = ESCAPE)."""
    with open(SET_PATHS[set_id]) as f:
        raw = json.load(f)
    out = {}
    for m_str, t in raw.items():
        m = int(m_str)
        out[m] = {"lengths": np.asarray(t["lengths"], np.int64),
                  "codes": np.asarray(t["codes"], np.int64)}
    return out


@lru_cache(maxsize=4)
def cost_table_np(set_id: int = 1) -> np.ndarray:
    """int32[MAX_M - 1, 2^MAX_M]: effective coded bits of symbol s at
    mantissa size m (row m - MIN_M). Escaped symbols cost esc_len + m."""
    tabs = load_tables(set_id)
    out = np.zeros((MAX_M - MIN_M + 1, 2 ** MAX_M), np.int32)
    for m in range(MIN_M, MAX_M + 1):
        lens = tabs[m]["lengths"]
        esc = lens[-1] + m
        row = np.where(lens[:-1] > 0, lens[:-1], esc)
        out[m - MIN_M, : 2 ** m] = row
    return out


def cost_table_jnp(set_id: int = 1) -> jnp.ndarray:
    return jnp.asarray(cost_table_np(set_id))


def run_decompose(row: np.ndarray):
    """(c0, [(start, delta), ...]) such that
    row[s] == c0 + Σ_r (s >= start_r) * delta_r  for all s.

    Canonical tables are highly run-structured (the trained set has ~127
    runs across all 508 symbols), so a table lookup becomes a short
    compare-accumulate chain instead of a TPU gather or a per-symbol
    select chain — the codec's recurring gather lesson (PERF.md).
    Exact for any integer row by construction.
    """
    row = np.asarray(row, np.int64)
    starts = np.flatnonzero(np.diff(row)) + 1
    return int(row[0]), [(int(s), int(row[s] - row[s - 1])) for s in starts]


def _apply_runs(sym, c0: int, runs) -> jnp.ndarray:
    """Evaluate a run-decomposed row at int32 symbols (device, fused)."""
    out = jnp.full(sym.shape, c0, jnp.int32)
    for start, delta in runs:
        out = out + jnp.where(sym >= start, jnp.int32(delta), 0)
    return out


def frame_mantissa_costs(mant, m_line, cost_tab):
    """Device-side per-frame coded sizes. mant, m_line: int32[H].

    Returns (raw_bits, huffman_bits): raw = sum m_line; huffman = table
    lookup for 2 <= m <= 8, raw m bits otherwise (SPEC.md §8).
    """
    raw = jnp.sum(m_line)
    codable = (m_line >= MIN_M) & (m_line <= MAX_M)
    row = jnp.clip(m_line - MIN_M, 0, MAX_M - MIN_M)
    huff_line = cost_tab[row, jnp.clip(mant, 0, 2 ** MAX_M - 1)]
    bits = jnp.where(codable, huff_line, m_line)
    return raw, jnp.sum(bits)


# ------------------------------------------------------- host: encoding ----

@lru_cache(maxsize=4)
def _enc_arrays(set_id: int = 1):
    """Per-m encode arrays padded to [MAX_M+1 rows, 2^MAX_M cols]:
    (code, len, escaped?). Row index = m (0/1 rows unused)."""
    tabs = load_tables(set_id)
    codes = np.zeros((MAX_M + 1, 2 ** MAX_M), np.int64)
    lens = np.zeros((MAX_M + 1, 2 ** MAX_M), np.int64)
    escaped = np.zeros((MAX_M + 1, 2 ** MAX_M), bool)
    for m in range(MIN_M, MAX_M + 1):
        t = tabs[m]
        n = 2 ** m
        esc_code, esc_len = t["codes"][-1], t["lengths"][-1]
        has = t["lengths"][:-1] > 0
        codes[m, :n] = np.where(has, t["codes"][:-1], esc_code)
        lens[m, :n] = np.where(has, t["lengths"][:-1], esc_len)
        escaped[m, :n] = ~has
    return codes, lens, escaped


def encode_fields(mant: np.ndarray, m_line: np.ndarray, set_id: int = 1):
    """Huffman-coded field pairs for one or more frames' mantissas.

    mant, m_line: int[..., H] → (vals, wids) of shape [..., H, 2]: per line
    a codeword field and an escape-raw field (width 0 when not escaped or
    m outside [2, 8] — then the codeword field IS the raw mantissa).
    """
    codes, lens, escaped = _enc_arrays(set_id)
    m = np.clip(m_line, 0, MAX_M)
    codable = (m_line >= MIN_M) & (m_line <= MAX_M)
    sym = np.clip(mant, 0, 2 ** MAX_M - 1)
    cw = np.where(codable, codes[m, sym], mant)
    cl = np.where(codable, lens[m, sym], m_line)
    esc = codable & escaped[m, sym]
    vals = np.stack([cw, np.where(esc, mant, 0)], axis=-1)
    wids = np.stack([cl, np.where(esc, m_line, 0)], axis=-1)
    return vals, wids


@lru_cache(maxsize=4)
def _enc_runs(set_id: int = 1):
    """Per-m run decompositions of the encode rows (see run_decompose):
    {m: (cl_c0, cl_runs, d_c0, d_runs, esc_c0, esc_runs)} where
    d[s] = code[s] - s — constant within every equal-length CODED run
    (canonical codes of same-length adjacent symbols differ by exactly 1),
    so the codeword lookup is a compare-accumulate chain too."""
    codes, lens, escaped = _enc_arrays(set_id)
    out = {}
    for m in range(MIN_M, MAX_M + 1):
        n = 1 << m
        sidx = np.arange(n)
        out[m] = (*run_decompose(lens[m, :n]),
                  *run_decompose(codes[m, :n] - sidx),
                  *run_decompose(escaped[m, :n].astype(np.int64)))
    return out


def encode_fields_device(mant, m_line, set_id: int = 1):
    """Device mirror of encode_fields (jit/vmap-safe, gather-free).

    mant, m_line: int32[..., H] → (vals, wids) int32[..., H, 2]: per line a
    codeword field and an escape-raw field (width 0 when not escaped or m
    outside [MIN_M, MAX_M] — then the codeword field IS the raw mantissa).
    Feeds tac.ops.bitpack.pack_rows so VBR payloads pack fully on device.

    The per-(m, symbol) code/length lookups run as run-decomposed
    compare-accumulate chains (_enc_runs) — ~127 fused elementwise ops
    total instead of two [K, H] TPU gathers into [9, 256] tables
    (integer-identical; tests/test_huffman.py asserts vs encode_fields).
    """
    runs = _enc_runs(set_id)
    m_line = jnp.asarray(m_line, jnp.int32)
    mant = jnp.asarray(mant, jnp.int32)
    cw = mant
    cl = m_line
    esc = jnp.zeros(mant.shape, jnp.int32)
    for m in range(MIN_M, MAX_M + 1):
        cl_c0, cl_r, d_c0, d_r, e_c0, e_r = runs[m]
        here = m_line == m
        cl = jnp.where(here, _apply_runs(mant, cl_c0, cl_r), cl)
        cw = jnp.where(here, mant + _apply_runs(mant, d_c0, d_r), cw)
        esc = jnp.where(here, _apply_runs(mant, e_c0, e_r), esc)
    escb = esc == 1
    vals = jnp.stack([cw, jnp.where(escb, mant, 0)], axis=-1)
    wids = jnp.stack([cl, jnp.where(escb, m_line, 0)], axis=-1)
    return vals, wids


# ------------------------------------------------------- host: decoding ----

@lru_cache(maxsize=4)
def _dec_luts(set_id: int = 1):
    """Per-m peek LUTs: (lut_sym[2^L], lut_len[2^L], L, escape_symbol)."""
    tabs = load_tables(set_id)
    luts = {}
    for m in range(MIN_M, MAX_M + 1):
        t = tabs[m]
        lens, codes = t["lengths"], t["codes"]
        L = int(max(lens))
        sym_lut = np.zeros(1 << L, np.int32)
        len_lut = np.zeros(1 << L, np.int32)
        for s, (l, c) in enumerate(zip(lens, codes)):
            if l == 0:
                continue
            base = c << (L - l)
            span = 1 << (L - l)
            sym_lut[base:base + span] = s
            len_lut[base:base + span] = l
        luts[m] = (sym_lut, len_lut, L, 2 ** m)
    return luts


def decode_lines(bits: np.ndarray, start: int, m_per_line: np.ndarray,
                 set_id: int = 1) -> tuple[np.ndarray, int]:
    """Sequential canonical decode of one block's mantissa run.

    bits: uint8[*] unpacked bit array; start: absolute bit offset;
    m_per_line: int[H] mantissa size per line (0 = absent).
    Returns (mant[H], end_offset).

    Raises tac.native.CorruptStreamError when a consuming read crosses the
    buffer end (truncated/malformed stream) — same contract as the C path.
    """
    from tac.native import CorruptStreamError

    luts = _dec_luts(set_id)
    out = np.zeros(len(m_per_line), np.int64)
    pos = start
    total = len(bits)

    def read_raw(pos, m):
        if pos + m > total:
            raise CorruptStreamError("mantissa walk past end of payload")
        v = 0
        for _ in range(m):
            v = (v << 1) | int(bits[pos])
            pos += 1
        return v, pos

    for i, m in enumerate(m_per_line):
        m = int(m)
        if m == 0:
            continue
        if m < MIN_M or m > MAX_M:
            out[i], pos = read_raw(pos, m)
            continue
        sym_lut, len_lut, L, esc = luts[m]
        peek = 0
        for j in range(L):
            b = int(bits[pos + j]) if pos + j < total else 0
            peek = (peek << 1) | b
        s = int(sym_lut[peek])
        pos += int(len_lut[peek])
        if pos > total:
            raise CorruptStreamError("huffman codeword past end of payload")
        if s == esc:
            out[i], pos = read_raw(pos, m)
        else:
            out[i] = s
    return out, pos
