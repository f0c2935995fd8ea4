"""Long/short block switching with transient detection (SPEC.md §9).

Capability parity with the reference's block-switching extension
(SURVEY.md §2 #12), redesigned TPU-first:

  * the reference's serial window-sequence FSM becomes VECTORIZED neighbor
    logic on per-half-block transient flags — no scan, no data-dependent
    control flow (SPEC.md §9 freezes the equivalence);
  * frame shapes stay rectangular: every frame computes BOTH the long-style
    encode (window selected per state from a [4, N] table) and the grouped
    K-sub-block short encode, and the bitstream picks by state — the
    pad-to-long + mask strategy of SURVEY.md §7 step 10 (2x compute, zero
    dynamic shapes);
  * short frames use AAC-style GROUPING (shared ovs/alloc/scale factors
    over the K sub-blocks, SPEC.md §9): the short payload has the SAME
    field layout and budget as a long payload, only the line→band map
    differs — so serialization is one rectangular field matrix for every
    state;
  * start/stop hybrid windows preserve TDAC across every legal state pair.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tac import bands, psy as psy_mod
from tac import codec as codec_mod
from tac.codec import CodecConsts, FrameCode
from tac.config import CodecConfig
from tac.dsp import mdct as fb
from tac.dsp.window import sine_window, transition_windows, window_fn

LONG, START, SHORT, STOP = 0, 1, 2, 3
EPS = 1e-12


def _by_state(state, table):
    """table[state] as a 4-way select instead of a gather (under vmap a
    [K]-indexed gather from [4, N] lowers to per-element loops on TPU —
    the recurring gather lesson, PERF.md)."""
    out = table[0] * jnp.ones_like(state, dtype=table.dtype) \
        if table.ndim == 1 else jnp.broadcast_to(table[0], table[0].shape)
    for s_ in (1, 2, 3):
        out = jnp.where(state == s_, table[s_], out)
    return out


class BsConsts(NamedTuple):
    """Host-built constants for the block-switching pipeline."""
    state_windows: jnp.ndarray   # [4, N] long/start/(unused)/stop windows
    state_gain: jnp.ndarray      # [4] psy MDCT gain 8/mean(w^2) per state
    short_window: jnp.ndarray    # [2*Hs]
    fwd_long: jnp.ndarray        # [N, H] UNwindowed cosine basis
    inv_long: jnp.ndarray        # [H, N]
    fwd_short: jnp.ndarray       # [2*Hs, Hs] short basis, window fused
    inv_short: jnp.ndarray       # [Hs, 2*Hs]
    sub_idx: jnp.ndarray         # [K, 2*Hs] frame-local sub-block gather
    cl: CodecConsts              # long-side consts (shared budget inside)
    cg: CodecConsts              # GROUPED short consts: band map tiled K
    psy_short: psy_mod.PsyConsts | None
    h3: int
    k: int


class BsFrameCode(NamedTuple):
    """Both encodings of one frame; `state` picks at serialization time.
    Long and grouped-short codes share shapes ([B] bands, [H] mantissas)."""
    state: jnp.ndarray           # [] int32 window state
    long: FrameCode
    short: FrameCode             # grouped: mant = flattened [K*Hs] = [H]


def make_bs_consts(cfg: CodecConfig) -> BsConsts:
    h, hs = cfg.n_mdct_lines, cfg.n_mdct_lines_short
    n, k, h3 = 2 * h, h // hs, (h - hs) // 2
    dt = np.float64 if cfg.precision == "parity" else np.float32
    wl = window_fn(cfg.window, n, cfg.kbd_alpha)
    wstart, wstop = transition_windows(n, 2 * hs, cfg.window, cfg.kbd_alpha)
    ws = sine_window(2 * hs)
    state_w = np.stack([wl, wstart, wl, wstop])      # SHORT slot unused
    gains = 8.0 / np.mean(state_w ** 2, axis=1)

    cl = codec_mod.make_consts(cfg)
    # SPEC §9: every state uses the same budget; frame_budget subtracts the
    # 2-bit windowState and (in the huffman combo) the 2-bit tableId
    cl = cl._replace(budget=codec_mod.frame_budget(cfg))

    # grouped short consts: the flattened [K*Hs] line vector's band map
    bol_s = bands.band_of_line(cfg.sample_rate, hs)
    nl_s = bands.lines_per_band(cfg.sample_rate, hs)
    scfg = cfg.replace(n_mdct_lines=hs)
    cg = cl._replace(
        band_of_line=jnp.asarray(np.tile(bol_s, k)),
        n_lines=jnp.asarray(k * nl_s),
        band_ranges=bands.band_line_ranges(cfg.sample_rate, hs),
        band_tile=k,
        window=jnp.asarray(ws, dt))

    sub_idx = h3 + np.arange(k)[:, None] * hs + np.arange(2 * hs)[None, :]
    return BsConsts(
        state_windows=jnp.asarray(state_w, dt),
        state_gain=jnp.asarray(gains, dt),
        short_window=jnp.asarray(ws, dt),
        fwd_long=jnp.asarray(fb.mdct_basis(h, None, np.float64), dt),
        inv_long=jnp.asarray(fb.imdct_basis(h, None, np.float64), dt),
        fwd_short=jnp.asarray(fb.mdct_basis(hs, ws, np.float64), dt),
        inv_short=jnp.asarray(fb.imdct_basis(hs, ws, np.float64), dt),
        sub_idx=jnp.asarray(sub_idx, jnp.int32),
        cl=cl, cg=cg,
        psy_short=psy_mod.make_consts(scfg) if cfg.use_psy else None,
        h3=h3, k=k)


# -------------------------------------------------------------- detection ---

def transient_flags(x, cfg: CodecConfig):
    """x: [..., T] → bool[..., Kb] per unpadded half-block (SPEC.md §9)."""
    h = cfg.n_mdct_lines
    t = x.shape[-1]
    kb = -(-t // h)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, kb * h - t)]
    blocks = jnp.pad(x, pad).reshape(*x.shape[:-1], kb, h)
    d2 = jnp.square(jnp.diff(blocks, axis=-1))           # [..., Kb, H-1]
    edges = np.round(np.arange(9) * (h - 1) / 8).astype(int)
    cum = jnp.cumsum(d2, axis=-1)
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
    e = cum[..., edges[1:]] - cum[..., edges[:-1]]       # [..., Kb, 8]
    ratio = e[..., 1:] / jnp.maximum(e[..., :-1], EPS)
    return (jnp.max(ratio, axis=-1) > cfg.transient_ratio) \
        & (jnp.max(e[..., 1:], axis=-1) > cfg.transient_energy_min)


def window_states(t_flags, f: int):
    """t_flags: bool[..., Kb] → int32[..., F] window states, VECTORIZED
    (SPEC.md §9 neighbor logic; provably TDAC-mesh-consistent)."""
    kb = t_flags.shape[-1]
    pad = [(0, 0)] * (t_flags.ndim - 1)
    tp = jnp.pad(t_flags, pad + [(1, max(f - kb, 1))])   # t[-1], t[>=Kb] = 0
    want = tp[..., :f] | tp[..., 1:f + 1]                # want[i] = t[i-1]|t[i]
    wprev = jnp.pad(want, pad + [(1, 0)])[..., :f]
    wnext = jnp.pad(want, pad + [(0, 1)])[..., 1:]
    short = want | (wprev & wnext)
    start = (~short) & wnext
    stop = (~short) & (~start) & wprev
    return jnp.where(short, SHORT,
                     jnp.where(start, START,
                               jnp.where(stop, STOP, LONG))).astype(jnp.int32)


# ----------------------------------------------------------------- encode ---

def analyze_frame_bs(frame, state, cfg: CodecConfig, c: BsConsts):
    """frame: [N] (unwindowed), state: [] int32 → the budget-independent
    analysis half: (long lines [H], long smr [B], grouped-short lines
    [K*Hs·...] flattened, short smr [B])."""
    w = _by_state(state, c.state_windows)
    if cfg.precision == "parity":
        lines_l = fb.mdct_fft(frame * w, c.cl.window.shape[0] // 2)
    else:
        lines_l = jnp.dot(frame * w, c.fwd_long,
                          preferred_element_type=c.fwd_long.dtype)
    if cfg.use_psy:
        smr_l = psy_mod.calc_smrs(frame, lines_l, c.cl.psy,
                                  mdct_gain=_by_state(state, c.state_gain))
    else:
        smr_l = jnp.zeros(bands.N_BANDS, c.cl.dtype)

    sub = frame[c.sub_idx]                               # [K, 2Hs]
    if cfg.precision == "parity":
        lines_s = fb.mdct_fft(sub * c.short_window, c.cg.window.shape[0] // 2)
    else:
        lines_s = jnp.dot(sub, c.fwd_short,
                          preferred_element_type=c.fwd_short.dtype)
    if cfg.use_psy:
        smr_s = jax.vmap(lambda fr, ln: psy_mod.calc_smrs(
            fr, ln, c.psy_short))(sub, lines_s)
        smr_s = jnp.max(smr_s, axis=0)                   # group: worst case
    else:
        smr_s = jnp.zeros(bands.N_BANDS, c.cg.dtype)
    return lines_l, smr_l, lines_s.reshape(-1), smr_s


def encode_frame_bs(frame, state, cfg: CodecConfig, c: BsConsts,
                    budget=None) -> BsFrameCode:
    """frame: [N] (unwindowed), state: [] int32 → both encodings.

    budget: optional traced int32 override of the static per-frame mantissa
    budget (the VBR bit-reservoir scan in the huffman combo, SPEC.md §8)."""
    lines_l, smr_l, lines_s, smr_s = analyze_frame_bs(frame, state, cfg, c)
    code_l = codec_mod.quantize_lines(lines_l, smr_l, cfg, c.cl, budget)
    code_s = codec_mod.quantize_lines(lines_s, smr_s, cfg, c.cg, budget)
    return BsFrameCode(state=state, long=code_l, short=code_s)


def decode_frame_bs(bc: BsFrameCode, cfg: CodecConfig, c: BsConsts):
    """BsFrameCode → [N] windowed output (pre-overlap-add)."""
    h = cfg.n_mdct_lines
    n = 2 * h
    s = cfg.n_scale_bits

    def dequant(fc: FrameCode, cc: CodecConsts):
        alloc = codec_mod.ba.code_to_alloc(fc.alloc_code)
        m_line = alloc[cc.band_of_line]
        sf_line = fc.scale[cc.band_of_line]
        scaled = codec_mod.quant.dequantize_mantissa(fc.mant, sf_line, s,
                                                     m_line, cc.dtype)
        return scaled * jnp.exp2(-fc.ovs.astype(cc.dtype))

    lines_l = dequant(bc.long, c.cl)
    w = _by_state(bc.state, c.state_windows)
    if cfg.precision == "parity":
        y_long = fb.imdct_fft(lines_l, h) * w
    else:
        y_long = jnp.dot(lines_l, c.inv_long,
                         preferred_element_type=c.inv_long.dtype) * w

    lines_s = dequant(bc.short, c.cg).reshape(c.k, -1)   # [K, Hs]
    if cfg.precision == "parity":
        y_sub = fb.imdct_fft(lines_s, lines_s.shape[-1]) * c.short_window
    else:
        y_sub = jnp.dot(lines_s, c.inv_short,
                        preferred_element_type=c.inv_short.dtype)
    # 50%-hop sub-blocks -> structured shifted-half sum + pad (no scatter;
    # every sample gets <= 2 contributions, so float-identical to the
    # index-order scatter-add: IEEE addition is commutative)
    hs = n // (2 * c.k)
    first, second = y_sub[..., :hs], y_sub[..., hs:]
    zero = jnp.zeros_like(first[..., :1, :])
    acc = (jnp.concatenate([first, zero], axis=-2)
           + jnp.concatenate([zero, second], axis=-2))   # [K+1, Hs]
    y_short = jnp.pad(acc.reshape(*acc.shape[:-2], -1), (c.h3, c.h3))
    return jnp.where(bc.state == SHORT, y_short.astype(y_long.dtype), y_long)


# ---------------------------------------------------------- serialization ---

def payload_fields_bs(bc: BsFrameCode, cfg: CodecConfig, c: BsConsts):
    """Device-side (vals, wids), SPEC.md §9: [2-bit state | §7 fields],
    values/widths selected per state (long vs grouped short — same NF)."""
    lv, lw = codec_mod.payload_fields(bc.long, cfg, c.cl)
    sv, sw = codec_mod.payload_fields(bc.short, cfg, c.cg)
    is_short = (bc.state == SHORT)[..., None]
    v = jnp.where(is_short, sv, lv)
    w = jnp.where(is_short, sw, lw)
    vals = jnp.concatenate([bc.state[..., None], v], axis=-1)
    wids = jnp.concatenate([jnp.full_like(bc.state[..., None], 2), w],
                           axis=-1)
    return vals, wids


def capacity_bits_bs(cfg: CodecConfig, c: BsConsts = None) -> int:
    """Pure host arithmetic — decode staging must NOT build BsConsts (its
    eager basis matrices are a multi-MB device upload per call)."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    budget = codec_mod.frame_budget(cfg)
    if cfg.stereo_mode == "ms":      # joint alloc: one channel may take all
        budget *= 2
    return 2 + s + bands.N_BANDS * (a + s) + budget + 32


# ----------------------------------------------- huffman + block switching ---

def select_code_bs(bc: BsFrameCode, c: BsConsts):
    """State-pick the serialized encoding: (FrameCode, m_line int32[..., H]).

    Long and grouped-short codes share shapes, so the pick is a jnp.where —
    no dynamic control flow. m_line follows the state's line→band map."""
    is_short = bc.state == SHORT
    sel = lambda l, s_: jnp.where(is_short[..., None], s_, l)
    code = codec_mod.FrameCode(
        ovs=jnp.where(is_short, bc.short.ovs, bc.long.ovs),
        alloc_code=sel(bc.long.alloc_code, bc.short.alloc_code),
        scale=sel(bc.long.scale, bc.short.scale),
        mant=sel(bc.long.mant, bc.short.mant))
    alloc = codec_mod.ba.code_to_alloc(code.alloc_code)
    m_line = jnp.where(is_short[..., None],
                       jnp.take(alloc, c.cg.band_of_line, axis=-1),
                       jnp.take(alloc, c.cl.band_of_line, axis=-1)
                       ).astype(jnp.int32)
    return code, m_line


def payload_fields_bs_vbr(bc: BsFrameCode, tid, cfg: CodecConfig,
                          c: BsConsts):
    """Device-side (vals, wids) for the huffman combo, SPEC.md §7 order:
    [2-bit state | ovs | 2-bit tableId | allocs | sfs | huffman-or-raw
    mantissa pairs]. Values/widths state-selected (long vs grouped short)."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    code, m_line = select_code_bs(bc, c)
    alloc = codec_mod.ba.code_to_alloc(code.alloc_code)
    hv, hw = codec_mod.vbr_mantissa_pairs(code.mant, m_line, tid,
                                          cfg.huffman_sets)
    ones = jnp.ones_like(code.alloc_code)
    vals = jnp.concatenate([bc.state[..., None], code.ovs[..., None],
                            tid[..., None], code.alloc_code, code.scale,
                            hv], axis=-1)
    wids = jnp.concatenate([jnp.full_like(bc.state[..., None], 2),
                            jnp.full_like(code.ovs[..., None], s),
                            jnp.full_like(tid[..., None], 2),
                            ones * a, jnp.where(alloc > 0, s, 0), hw],
                           axis=-1)
    return vals, wids


def capacity_bits_bs_vbr(cfg: CodecConfig, c: BsConsts = None) -> int:
    """Pure host arithmetic — decode staging must NOT build BsConsts (its
    eager basis matrices are a multi-MB device upload per call)."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    budget = codec_mod.frame_budget(cfg)
    if cfg.stereo_mode == "ms":      # joint reservoir: pair budget, one ch
        budget *= 2
    return 2 + s + 2 + bands.N_BANDS * (a + s) \
        + budget * (1 + cfg.reservoir_factor) + 32


def _encode_channel_bs_vbr(frames_1ch, states_1ch, res0, cfg: CodecConfig,
                           c: BsConsts, cost_tab):
    """Windowstate-aware bit-reservoir scan over one channel (SPEC.md §8+§9).

    Identical reservoir arithmetic to codec._encode_channel_vbr, but the
    mantissa pricing follows the frame's window state: grouped-short band
    map for SHORT frames, long map otherwise. carry = reservoir fill."""
    from tac import huffman as hf

    base = jnp.asarray(c.cl.budget, jnp.int32)
    cap = jnp.asarray(cfg.reservoir_factor * c.cl.budget, jnp.int32)

    # hoist the budget-independent analysis (MDCT long+short, psy) out of
    # the serial reservoir chain as one batched vmap — same ops, bit-exact
    ll, sl, ls, ss = jax.vmap(
        lambda fr, st: analyze_frame_bs(fr, st, cfg, c))(frames_1ch,
                                                         states_1ch)

    def step(res, xs):
        state, lln, sln, lsn, ssn = xs
        code_l = codec_mod.quantize_lines(lln, sln, cfg, c.cl, base + res)
        code_s = codec_mod.quantize_lines(lsn, ssn, cfg, c.cg, base + res)
        bc = BsFrameCode(state=state, long=code_l, short=code_s)
        code, m_line = select_code_bs(bc, c)
        # 3-way raw/set1/set2 min, tie order 0 <= 1 <= 2 — identical to
        # the lane path's _vbr_price/argmin (SPEC §8)
        raw, huf = hf.frame_mantissa_costs(code.mant, m_line, cost_tab[0])
        table_id = (huf < raw).astype(jnp.int32)
        used = jnp.minimum(raw, huf).astype(jnp.int32)
        for si in range(1, len(cost_tab)):
            _, huf_s = hf.frame_mantissa_costs(code.mant, m_line,
                                               cost_tab[si])
            better = huf_s < used
            table_id = jnp.where(better, si + 1, table_id)
            used = jnp.minimum(used, huf_s).astype(jnp.int32)
        res2 = jnp.clip(res + base - used, 0, cap)
        return res2, (bc, table_id, res2)

    _, (bcs, tids, res_steps) = jax.lax.scan(
        step, jnp.asarray(res0, jnp.int32), (states_1ch, ll, sl, ls, ss))
    return bcs, tids, res_steps


def _encode_bs_vbr_lanes(frames, states, res0, cfg: CodecConfig,
                         c: BsConsts, cost_tab):
    """Lane-batched windowState-aware reservoir scan (the combo mirror of
    codec._encode_vbr_lanes, VERDICT r2 item 1).

    frames f[L, F, N], states i32[L, F], res0 i32[L] (or scalar) →
    (BsFrameCode [L, F, ...], table_id [L, F], res_steps [L, F]) —
    byte-identical to vmapping _encode_channel_bs_vbr over lanes
    (tests/test_bs_vbr.py, goldens config6): the window state picks which
    encoding is serialized and it is budget-independent, so the scan only
    allocates the state-SELECTED encoding per lane — smr, Huffman band-
    cost table, and line→band map are pre-selected by state in the
    parallel phase, and each scan step is one warm start + Pallas
    water-fill + 7-way select over [L, B], with per-row n_lines carrying
    the long-vs-grouped-short band widths. Quantization of both encodings
    at the scan's allocations happens in the parallel phase 3 (the
    non-selected one is never serialized). TAC_VBR_SERIAL=1 (trace-time)
    keeps the per-frame scan for A/B."""
    import os

    lanes, f = frames.shape[0], frames.shape[1]
    res0 = jnp.broadcast_to(jnp.asarray(res0, jnp.int32), (lanes,))
    if os.environ.get("TAC_VBR_SERIAL"):
        return jax.vmap(lambda fr, st, r0: _encode_channel_bs_vbr(
            fr, st, r0, cfg, c, cost_tab))(frames, states, res0)

    rows = frames.reshape(lanes * f, frames.shape[-1])
    st_rows = states.reshape(lanes * f)

    def phase1(fr, st):
        ll, sl, ls, ss = jax.vmap(
            lambda f_, s_: analyze_frame_bs(f_, s_, cfg, c))(fr, st)
        bh_l = codec_mod._vbr_band_costs(ll, cfg, c.cl)
        bh_s = codec_mod._vbr_band_costs(ls, cfg, c.cg)
        shrt = (st == SHORT)
        smr = jnp.where(shrt[:, None], ss, sl)
        bh = jnp.where(shrt[:, None, None], bh_s, bh_l)
        return ll, ls, smr, bh

    ll, ls, smr, bh = codec_mod._map_row_chunks(
        phase1, (rows, st_rows), lanes * f)
    nl_rows = jnp.where((st_rows == SHORT)[:, None],
                        c.cg.n_lines, c.cl.n_lines)       # [R, B]
    to_lf = lambda x: x.reshape(lanes, f, *x.shape[1:]).swapaxes(0, 1)

    allocs, tids, _, res_steps = codec_mod._reservoir_chain(
        to_lf(smr), to_lf(bh), to_lf(nl_rows), res0, c.cl.budget,
        cfg.reservoir_factor * c.cl.budget, cfg)

    al_rows = allocs.swapaxes(0, 1).reshape(lanes * f, -1)
    code_l, code_s = codec_mod._map_row_chunks(
        lambda l1, l2, al: (
            jax.vmap(lambda a_, b_: codec_mod.quantize_given_alloc(
                a_, b_, cfg, c.cl))(l1, al),
            jax.vmap(lambda a_, b_: codec_mod.quantize_given_alloc(
                a_, b_, cfg, c.cg))(l2, al)),
        (ll, ls, al_rows), lanes * f)
    unflat = lambda t: jax.tree_util.tree_map(
        lambda x: x.reshape(lanes, f, *x.shape[1:]), t)
    bc = BsFrameCode(state=states, long=unflat(code_l), short=unflat(code_s))
    swap = lambda x: x.swapaxes(0, 1)
    return bc, swap(tids), swap(res_steps)


def _encode_bs_vbr_lanes_to_words(frames, states, res0, cfg: CodecConfig,
                                  c: BsConsts, cost_tab):
    """_encode_bs_vbr_lanes fused to packed words: phase-3 quantization,
    the combo payload-field build, and the bit pack run inside each row
    chunk (the whole-array-pass elimination of codec._encode_rows_to_words
    applied to the combo; bytes identical — every op is per-row).
    frames f[L, F, N], states i32[L, F] → (words u32[L, F, W32],
    nbits i32[L, F])."""
    import os

    from tac.ops.bitpack import pack_rows

    cap = capacity_bits_bs_vbr(cfg, c)
    if os.environ.get("TAC_VBR_SERIAL"):
        bc, tids, _ = _encode_bs_vbr_lanes(frames, states, res0, cfg, c,
                                           cost_tab)
        vals, wids = payload_fields_bs_vbr(bc, tids, cfg, c)
        return pack_rows(vals, wids, cap)

    lanes, f = frames.shape[0], frames.shape[1]
    res0 = jnp.broadcast_to(jnp.asarray(res0, jnp.int32), (lanes,))
    rows = frames.reshape(lanes * f, frames.shape[-1])
    st_rows = states.reshape(lanes * f)

    def phase1(fr, st):
        ll, sl, ls, ss = jax.vmap(
            lambda f_, s_: analyze_frame_bs(f_, s_, cfg, c))(fr, st)
        bh_l = codec_mod._vbr_band_costs(ll, cfg, c.cl)
        bh_s = codec_mod._vbr_band_costs(ls, cfg, c.cg)
        shrt = (st == SHORT)
        smr = jnp.where(shrt[:, None], ss, sl)
        bh = jnp.where(shrt[:, None, None], bh_s, bh_l)
        return ll, ls, smr, bh

    ll, ls, smr, bh = codec_mod._map_row_chunks(
        phase1, (rows, st_rows), lanes * f)
    nl_rows = jnp.where((st_rows == SHORT)[:, None],
                        c.cg.n_lines, c.cl.n_lines)       # [R, B]
    to_lf = lambda x: x.reshape(lanes, f, *x.shape[1:]).swapaxes(0, 1)

    allocs, tids, _, _ = codec_mod._reservoir_chain(
        to_lf(smr), to_lf(bh), to_lf(nl_rows), res0, c.cl.budget,
        cfg.reservoir_factor * c.cl.budget, cfg)
    al_rows = allocs.swapaxes(0, 1).reshape(lanes * f, -1)
    tid_rows = tids.swapaxes(0, 1).reshape(lanes * f)

    def chunk_words(l1, l2, al, st, td):
        code_l = jax.vmap(lambda a_, b_: codec_mod.quantize_given_alloc(
            a_, b_, cfg, c.cl))(l1, al)
        code_s = jax.vmap(lambda a_, b_: codec_mod.quantize_given_alloc(
            a_, b_, cfg, c.cg))(l2, al)
        bc = BsFrameCode(state=st, long=code_l, short=code_s)
        vals, wids = payload_fields_bs_vbr(bc, td, cfg, c)
        return pack_rows(vals, wids, cap)

    words, nbits = codec_mod._map_row_chunks(
        chunk_words, (ll, ls, al_rows, st_rows, tid_rows), lanes * f)
    return (words.reshape(lanes, f, words.shape[-1]),
            nbits.reshape(lanes, f))


def _encode_bs_vbr_ms_to_words(frames, states, res0, cfg: CodecConfig,
                               c: BsConsts):
    """M/S × blockswitch × huffman-VBR encode (SPEC.md §11 × §9 × §8).

    frames f[P, 2, F, N] (M/S-transformed pairs), states i32[P, F]
    (SHARED per pair), res0 i32[P] carried joint fills → (words
    u32[P, 2, F, W32], nbits i32[P, 2, F], res_steps i32[P, F]). One
    reservoir lane per pair over the 2B STATE-SELECTED bands (base =
    2·budget); the raw-vs-huffman choice is joint (one tableId per
    pair). Same phase structure as _encode_bs_vbr_lanes_to_words."""
    from tac.ops.bitpack import pack_rows

    p, _, f, n = frames.shape
    nb = bands.N_BANDS
    cap = capacity_bits_bs_vbr(cfg, c)
    # frame-major pair-adjacent rows: row (pr, fr, ch); both rows of a
    # pair carry the SAME window state
    rows = frames.swapaxes(1, 2).reshape(p * f * 2, n)
    st_rows = jnp.repeat(states.reshape(p * f), 2)

    def phase1(fr, st):
        ll, sl, ls, ss = jax.vmap(
            lambda f_, s_: analyze_frame_bs(f_, s_, cfg, c))(fr, st)
        bh_l = codec_mod._vbr_band_costs(ll, cfg, c.cl)
        bh_s = codec_mod._vbr_band_costs(ls, cfg, c.cg)
        shrt = (st == SHORT)
        smr = jnp.where(shrt[:, None], ss, sl)
        bh = jnp.where(shrt[:, None, None], bh_s, bh_l)
        return ll, ls, smr, bh

    ll, ls, smr, bh = codec_mod._map_row_chunks(
        phase1, (rows, st_rows), p * f * 2)
    nl_rows = jnp.where((st_rows == SHORT)[:, None],
                        c.cg.n_lines, c.cl.n_lines)       # [R, B]
    # pair-join the band axis: rows (pr, fr, ch) → [P, F, 2B]
    smr2 = smr.reshape(p, f, 2 * nb)
    bh2 = bh.reshape(p, f, 2 * nb, bh.shape[-1])
    nl2 = nl_rows.reshape(p, f, 2 * nb)
    to_fl = lambda x_: x_.swapaxes(0, 1)                 # [P, F, ..]→[F, P]

    allocs, tids, _, res_steps = codec_mod._reservoir_chain(
        to_fl(smr2), to_fl(bh2), to_fl(nl2),
        jnp.asarray(res0, jnp.int32), 2 * c.cl.budget,
        cfg.reservoir_factor * 2 * c.cl.budget, cfg)

    al_rows = allocs.swapaxes(0, 1).reshape(p * f * 2, nb)
    tid_rows = jnp.repeat(tids.swapaxes(0, 1).reshape(p * f), 2)

    def chunk_words(l1, l2, al, st, td):
        code_l = jax.vmap(lambda a_, b_: codec_mod.quantize_given_alloc(
            a_, b_, cfg, c.cl))(l1, al)
        code_s = jax.vmap(lambda a_, b_: codec_mod.quantize_given_alloc(
            a_, b_, cfg, c.cg))(l2, al)
        bc = BsFrameCode(state=st, long=code_l, short=code_s)
        vals, wids = payload_fields_bs_vbr(bc, td, cfg, c)
        return pack_rows(vals, wids, cap)

    words, nbits = codec_mod._map_row_chunks(
        chunk_words, (ll, ls, al_rows, st_rows, tid_rows), p * f * 2)
    words = words.reshape(p, f, 2, words.shape[-1]).swapaxes(1, 2)
    return (words, nbits.reshape(p, f, 2).swapaxes(1, 2),
            res_steps.swapaxes(0, 1))


@partial(jax.jit, static_argnums=(1,))
def _encode_bs_vbr_packed_leading(x, cfg: CodecConfig):
    """x: [..., C, T] → (words [..., C, F, W32], nbits [..., C, F]).

    Leading axes flatten into independent reservoir lanes (each lane one
    channel's chain from fill 0 — or one M/S PAIR's joint chain with a
    SHARED window state in ms mode, SPEC.md §11), so corpus batches
    produce per-clip bytes identical to solo encodes
    (tests/test_corpus.py)."""
    from tac import huffman as hf

    c = make_bs_consts(cfg)
    xt = x.astype(c.cl.dtype)
    if cfg.stereo_mode == "ms":
        xt = codec_mod.ms_forward(xt)
    frames = fb.frame_signal(xt, cfg.n_mdct_lines)       # [..., C, F, N]
    lead, f = frames.shape[:-2], frames.shape[-2]
    cost_tab = codec_mod.cost_tables(cfg)
    if cfg.stereo_mode == "ms":
        tfl = transient_flags(xt, cfg)                   # [..., C, Kb]
        tp = tfl.reshape(*tfl.shape[:-2], -1, 2, tfl.shape[-1])
        t_pair = tp[..., 0, :] | tp[..., 1, :]           # [..., P, Kb]
        states = window_states(t_pair, f)                # [..., P, F] shared
        pf = frames.reshape(-1, 2, f, frames.shape[-1])
        words, nbits, _ = _encode_bs_vbr_ms_to_words(
            pf, states.reshape(-1, f), jnp.zeros(pf.shape[0], jnp.int32),
            cfg, c)
        return (words.reshape(*lead, f, words.shape[-1]),
                nbits.reshape(*lead, f))
    states = window_states(transient_flags(xt, cfg), f)
    words, nbits = _encode_bs_vbr_lanes_to_words(
        frames.reshape(-1, f, frames.shape[-1]), states.reshape(-1, f),
        0, cfg, c, cost_tab)
    return (words.reshape(*lead, f, words.shape[-1]),
            nbits.reshape(*lead, f))


def _encode_clip_bs_vbr_packed_impl(x, cfg: CodecConfig):
    return _encode_bs_vbr_packed_leading(x, cfg)


def encode_clip_bs_vbr_packed(x, cfg: CodecConfig):
    """x: [C, T] → (words uint32[C, F, W32], nbits int32[C, F]) — the
    huffman × block-switch combo entry (device encode + device pack)."""
    return _encode_clip_bs_vbr_packed_impl(x, cfg)


def _unpack_bs_vbr_fields(wf, cfg: CodecConfig, c: BsConsts) -> BsFrameCode:
    """Device combo field unpack: uint32[K, W32] rows → BsFrameCode [K, ...]
    (SPEC.md §7 combo layout). Raw rows via cumsum-offset gathers, huffman
    rows via the line-axis canonical decode scan, band map per state."""
    from tac.ops.bitunpack import read_fields

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    nb = bands.N_BANDS
    k = wf.shape[0]

    head_off = jnp.concatenate([
        jnp.asarray([0, 2, 2 + s], jnp.int32),
        4 + s + a * jnp.arange(nb, dtype=jnp.int32)])
    head_wid = jnp.concatenate([jnp.asarray([2, s, 2], jnp.int32),
                                jnp.full(nb, a, jnp.int32)])
    head = read_fields(wf, jnp.broadcast_to(head_off, (k, nb + 3)),
                       jnp.broadcast_to(head_wid, (k, nb + 3)))
    state, ovs, tid, alloc_code = (head[:, 0], head[:, 1], head[:, 2],
                                   head[:, 3:])
    alloc = codec_mod.ba.code_to_alloc(alloc_code)

    sf_w = jnp.where(alloc > 0, s, 0).astype(jnp.int32)
    sf_end = jnp.cumsum(sf_w, axis=1)
    sf = read_fields(wf, (4 + s + a * nb) + (sf_end - sf_w), sf_w)

    m_line = jnp.where((state == SHORT)[:, None],
                       jnp.take(alloc, c.cg.band_of_line, axis=1),
                       jnp.take(alloc, c.cl.band_of_line, axis=1)
                       ).astype(jnp.int32)
    mant_start = (4 + s + a * nb) + sf_end[:, -1]
    m_end = jnp.cumsum(m_line, axis=1)
    mant_raw = read_fields(wf, mant_start[:, None] + (m_end - m_line),
                           m_line)
    mant = codec_mod._huffman_or_raw(wf, mant_start, m_line, tid, mant_raw)
    fc = codec_mod.FrameCode(ovs=ovs, alloc_code=alloc_code, scale=sf,
                             mant=mant)
    return BsFrameCode(state=state, long=fc, short=fc)


@partial(jax.jit, static_argnums=(1, 2))
def _decode_clip_bs_vbr_packed_impl(words, cfg: CodecConfig, t: int):
    """words: uint32[C, F, W32] combo payload rows → [C, T], fully on device
    (decode mirror of _encode_clip_bs_vbr_packed_impl)."""
    c = make_bs_consts(cfg)
    h = cfg.n_mdct_lines
    lead = words.shape[:-1]                              # [C, F]
    bc = _unpack_bs_vbr_fields(words.reshape(-1, words.shape[-1]), cfg, c)
    y = jax.vmap(lambda b: decode_frame_bs(b, cfg, c))(bc)    # [K, N]
    out = fb.overlap_add(y.reshape(*lead, 2 * h), h, t)
    return codec_mod.ms_inverse(out) if cfg.stereo_mode == "ms" else out


def decode_clip_bs_vbr_packed(words, cfg: CodecConfig, t: int):
    """uint32[C, F, W32] payload rows → [C, T] (huffman combo streams)."""
    return _decode_clip_bs_vbr_packed_impl(words, cfg, t)


def _encode_rows_bs(frames_flat, states_flat, cfg: CodecConfig,
                    c: BsConsts) -> BsFrameCode:
    """[R, N] frames + [R] states → BsFrameCode [R, ...] in lax.map chunks
    of codec._enc_chunk() rows (same program-size bound as the long path)."""
    chunk = codec_mod._enc_chunk()
    r = frames_flat.shape[0]
    enc = jax.vmap(lambda fr, st: encode_frame_bs(fr, st, cfg, c))
    if r <= chunk:
        return enc(frames_flat, states_flat)
    pad = (-r) % chunk
    fp = jnp.pad(frames_flat, ((0, pad), (0, 0)))
    sp = jnp.pad(states_flat, ((0, pad),))
    out = jax.lax.map(lambda args: enc(*args),
                      (fp.reshape(-1, chunk, fp.shape[-1]),
                       sp.reshape(-1, chunk)))
    return jax.tree_util.tree_map(
        lambda l: l.reshape(-1, *l.shape[2:])[:r], out)


def _encode_ms_bs_rows_chunk(fr, st, cfg: CodecConfig, c: BsConsts):
    """[M, N] pair-adjacent frame rows + shared states → (BsFrameCode,
    joint alloc): the M/S × blockswitch encode chunk (SPEC.md §11 × §9).
    One water-fill per pair over the 2B STATE-SELECTED bands (both rows
    of a pair carry the same state, hence the same band map)."""
    ll, sl, ls, ss = jax.vmap(
        lambda f_, s_: analyze_frame_bs(f_, s_, cfg, c))(fr, st)
    shrt = (st == SHORT)
    smr = jnp.where(shrt[:, None], ss, sl)
    nl = jnp.where(shrt[:, None], c.cg.n_lines, c.cl.n_lines)
    alloc = codec_mod._joint_alloc_pair_rows(smr, nl, c.cl.budget, cfg)
    code_l = jax.vmap(lambda a_, b_: codec_mod.quantize_given_alloc(
        a_, b_, cfg, c.cl))(ll, alloc)
    code_s = jax.vmap(lambda a_, b_: codec_mod.quantize_given_alloc(
        a_, b_, cfg, c.cg))(ls, alloc)
    return BsFrameCode(state=st, long=code_l, short=code_s)


@partial(jax.jit, static_argnums=(1,))
def _encode_bs_packed_leading(x, cfg: CodecConfig):
    """x: [..., C, T] → (words [..., C, F, W32], nbits [..., C, F]); all
    leading axes flatten into one frame-row axis (_enc_chunk-bounded).
    Fields + pack run inside each chunk (codec._encode_rows_to_words's
    whole-array-pass elimination; bytes identical).

    M/S mode (SPEC.md §11 × §9): the butterfly runs first, transient
    flags OR across the pair (one shared window state), rows interleave
    frame-major so pairs are adjacent, and the allocation is joint."""
    from tac.ops.bitpack import pack_rows

    c = make_bs_consts(cfg)
    h = cfg.n_mdct_lines
    xt = x.astype(c.cl.dtype)
    if cfg.stereo_mode == "ms":
        xt = codec_mod.ms_forward(xt)
    frames = fb.frame_signal(xt, h)                      # [..., C, F, N]
    lead = frames.shape[:-1]
    f = frames.shape[-2]
    cap = capacity_bits_bs(cfg, c)
    # half the tuned chunk: the bs chunk runs BOTH window paths per row
    # plus fields+pack, and the full-size program deterministically
    # faults this box's TPU worker (the same >1.7k-row fault mode the
    # autotuner exists for; 1024 measured clean here)
    bs_chunk = max(512, codec_mod._enc_chunk() // 2)

    if cfg.stereo_mode == "ms":
        tfl = transient_flags(xt, cfg)                   # [..., C, Kb]
        tp = tfl.reshape(*tfl.shape[:-2], -1, 2, tfl.shape[-1])
        t_pair = tp[..., 0, :] | tp[..., 1, :]           # [..., P, Kb]
        states = window_states(t_pair, f)                # [..., P, F]
        fr = jnp.swapaxes(frames, -3, -2)                # [..., F, C, N]
        # each channel rides its pair's shared state: [..., P, F] →
        # [..., C, F] → [..., F, C]
        st = jnp.swapaxes(jnp.repeat(states, 2, axis=-2), -2, -1)

        def chunk_words_ms(frc, stc):
            bc = _encode_ms_bs_rows_chunk(frc, stc, cfg, c)
            vals, wids = payload_fields_bs(bc, cfg, c)
            return pack_rows(vals, wids, cap)

        words, nbits = codec_mod._map_row_chunks(
            chunk_words_ms, (fr.reshape(-1, fr.shape[-1]),
                             st.reshape(-1)), int(np.prod(fr.shape[:-1])),
            chunk=bs_chunk)
        words = jnp.swapaxes(
            words.reshape(*fr.shape[:-1], words.shape[-1]), -3, -2)
        return words, jnp.swapaxes(nbits.reshape(fr.shape[:-1]), -2, -1)

    states = window_states(transient_flags(xt, cfg), f)
    enc = jax.vmap(lambda fr, st: encode_frame_bs(fr, st, cfg, c))

    def chunk_words(fr, st):
        bc = enc(fr, st)
        vals, wids = payload_fields_bs(bc, cfg, c)
        return pack_rows(vals, wids, cap)

    words, nbits = codec_mod._map_row_chunks(
        chunk_words, (frames.reshape(-1, frames.shape[-1]),
                      states.reshape(-1)), int(np.prod(lead)),
        chunk=bs_chunk)
    return (words.reshape(*lead, words.shape[-1]), nbits.reshape(lead))


def _encode_clip_bs_packed_impl(x, cfg: CodecConfig):
    return _encode_bs_packed_leading(x, cfg)


def encode_clip_bs_packed(x, cfg: CodecConfig):
    """x: [C, T] → (words uint32[C, F, W32], nbits int32[C, F])."""
    return _encode_clip_bs_packed_impl(x, cfg)


def _stream_states(t, m: int):
    """Window states for m streaming frames from the carried+new transient
    flags t = (t_{e-2}, ..., t_{e+m}) [C, m+3] — the same neighbor logic as
    the offline window_states (SPEC.md §9), windowed out of the history."""
    tm2, tm1 = t[:, 0:m], t[:, 1:m + 1]
    t0, tp1 = t[:, 2:m + 2], t[:, 3:m + 3]
    want_prev, want, want_next = tm2 | tm1, tm1 | t0, t0 | tp1
    short = want | (want_prev & want_next)
    start = (~short) & want_next
    stop = (~short) & (~start) & want_prev
    return jnp.where(short, SHORT,
                     jnp.where(start, START,
                               jnp.where(stop, STOP, LONG))).astype(jnp.int32)


@partial(jax.jit, static_argnums=(4,))
def _encode_frames_bs_packed(prior, look, new_halves, t_hist,
                             cfg: CodecConfig):
    """Streaming block-switch core: emit one frame per new lookahead half.

    With e = index of the next frame to emit and halves h_j (h_j covers
    samples [j*H, (j+1)*H)): prior [C, H] = h_{e-1}, look [C, H] = h_e,
    new_halves [C, m, H] = h_{e+1..e+m}, t_hist bool[C, 2] =
    (t_{e-2}, t_{e-1}) transient flags. Frame j = [h_{j-1} | h_j]; its
    window state needs flags t_{j-2..j+1} — the identical neighbor logic
    as the offline window_states (SPEC.md §9), just windowed out of the
    carried history, so stream bytes == offline bytes.

    Returns (words [C, m, W32], nbits [C, m], t bool[C, m+3]) where t =
    (t_{e-2}, ..., t_{e+m}); the caller slices its new carry out of t (at
    the TRUE m when the frame axis was bucket-padded).
    """
    from tac.ops.bitpack import pack_rows

    c = make_bs_consts(cfg)
    dt = c.cl.dtype
    ch, m = new_halves.shape[0], new_halves.shape[1]
    halves = jnp.concatenate(
        [prior.astype(dt)[:, None], look.astype(dt)[:, None],
         new_halves.astype(dt)], axis=1)                 # [C, m+2]: h_{e-1..e+m}
    frames = jnp.concatenate([halves[:, :m], halves[:, 1:m + 1]], axis=-1)

    flags = transient_flags(halves[:, 1:].reshape(ch, -1), cfg)  # t_{e..e+m}
    t = jnp.concatenate([t_hist, flags], axis=1)         # [C, m+3]
    states = _stream_states(t, m)

    bc = _encode_rows_bs(frames.reshape(ch * m, -1), states.reshape(ch * m),
                         cfg, c)
    bc = jax.tree_util.tree_map(lambda l: l.reshape(ch, m, *l.shape[1:]), bc)
    vals, wids = payload_fields_bs(bc, cfg, c)
    words, nbits = pack_rows(vals, wids, capacity_bits_bs(cfg, c))
    return words, nbits, t


@partial(jax.jit, static_argnums=(5,))
def _encode_frames_bs_vbr_packed(prior, look, new_halves, t_hist, res0,
                                 cfg: CodecConfig):
    """Streaming huffman-combo core: the same halves/flags contract as
    _encode_frames_bs_packed plus per-channel reservoir fills res0 [C]
    (the carried StreamState reservoir). Runs the windowState-aware
    reservoir scan resumed from res0, so stream bytes == offline bytes.

    Returns (words [C, m, W32], nbits [C, m], t bool[C, m+3],
    res_steps int32[C, m])."""
    from tac import huffman as hf
    from tac.ops.bitpack import pack_rows

    c = make_bs_consts(cfg)
    dt = c.cl.dtype
    ch, m = new_halves.shape[0], new_halves.shape[1]
    halves = jnp.concatenate(
        [prior.astype(dt)[:, None], look.astype(dt)[:, None],
         new_halves.astype(dt)], axis=1)                 # [C, m+2]
    frames = jnp.concatenate([halves[:, :m], halves[:, 1:m + 1]], axis=-1)
    flags = transient_flags(halves[:, 1:].reshape(ch, -1), cfg)
    t = jnp.concatenate([t_hist, flags], axis=1)         # [C, m+3]
    states = _stream_states(t, m)

    cost_tab = codec_mod.cost_tables(cfg)
    bc, tids, res_steps = _encode_bs_vbr_lanes(
        frames, states, jnp.asarray(res0, jnp.int32), cfg, c, cost_tab)
    vals, wids = payload_fields_bs_vbr(bc, tids, cfg, c)
    words, nbits = pack_rows(vals, wids, capacity_bits_bs_vbr(cfg, c))
    return words, nbits, t, res_steps


def _ms_stream_prep(prior, look, new_halves, t_hist, c: BsConsts,
                    cfg: CodecConfig):
    """Shared front half of the M/S streaming cores: L/R half-block
    buffers → (M/S frames [C, m, N], shared states [P, m], t bool[P, m+3]),
    P = C//2 channel pairs.

    The butterfly is per-sample, so running it on the formed halves is
    bit-identical to offline's butterfly-then-frame at the same dtype
    (SPEC.md §11 streaming contract); transient flags are computed per
    M/S channel and OR-ed across each pair — ONE window state per frame
    per pair, the joint allocation's precondition (SPEC.md §11 × §9)."""
    dt = c.cl.dtype
    ch, m = new_halves.shape[0], new_halves.shape[1]
    halves = jnp.concatenate(
        [prior.astype(dt)[:, None], look.astype(dt)[:, None],
         new_halves.astype(dt)], axis=1)                 # [C, m+2] L/R
    halves = codec_mod.ms_forward(halves.swapaxes(0, 1)).swapaxes(0, 1)
    frames = jnp.concatenate([halves[:, :m], halves[:, 1:m + 1]], axis=-1)
    flags = transient_flags(halves[:, 1:].reshape(ch, -1), cfg)  # [C, m+1]
    t_pair = flags[0::2] | flags[1::2]                   # [P, m+1]
    t = jnp.concatenate([t_hist, t_pair], axis=1)        # [P, m+3]
    return frames, _stream_states(t, m), t


@partial(jax.jit, static_argnums=(4,))
def _encode_frames_bs_ms_packed(prior, look, new_halves, t_hist,
                                cfg: CodecConfig):
    """Streaming M/S × blockswitch core (SPEC.md §11 × §9): the same
    halves contract as _encode_frames_bs_packed, but prior/look [C, H]
    and new_halves [C, m, H] arrive in the L/R domain and t_hist
    bool[P, 2] carries the SHARED pair flags (t_{e-2}, t_{e-1}) per
    channel pair (P = C//2). The joint pair water-fill over the 2B
    state-selected bands is the offline _encode_ms_bs_rows_chunk —
    stream bytes == offline bytes.
    Returns (words [C, m, W32], nbits [C, m], t bool[P, m+3])."""
    from tac.ops.bitpack import pack_rows

    c = make_bs_consts(cfg)
    ch, m = new_halves.shape[0], new_halves.shape[1]
    frames, states, t = _ms_stream_prep(prior, look, new_halves, t_hist,
                                        c, cfg)
    rows = frames.swapaxes(0, 1).reshape(ch * m, -1)     # pair-adjacent
    # per-row states in (frame, channel) order: [P, m] → [m, C] → [R]
    st_rows = jnp.repeat(states.swapaxes(0, 1), 2, axis=-1).reshape(-1)
    bc = _encode_ms_bs_rows_chunk(rows, st_rows, cfg, c)
    vals, wids = payload_fields_bs(bc, cfg, c)
    words, nbits = pack_rows(vals, wids, capacity_bits_bs(cfg, c))
    return (words.reshape(m, ch, -1).swapaxes(0, 1),
            nbits.reshape(m, ch).swapaxes(0, 1), t)


@partial(jax.jit, static_argnums=(5,))
def _encode_frames_bs_vbr_ms_packed(prior, look, new_halves, t_hist, res0,
                                    cfg: CodecConfig):
    """Streaming M/S × blockswitch × huffman core (SPEC.md §11 × §9 × §8):
    _encode_frames_bs_ms_packed plus the carried JOINT reservoir fills
    res0 i32[P] (one lane per pair, resumed — stream bytes == offline
    bytes). Returns (words [C, m, W32], nbits [C, m], t bool[P, m+3],
    res_steps i32[P, m])."""
    c = make_bs_consts(cfg)
    ch, m = new_halves.shape[0], new_halves.shape[1]
    frames, states, t = _ms_stream_prep(prior, look, new_halves, t_hist,
                                        c, cfg)
    words, nbits, res_steps = _encode_bs_vbr_ms_to_words(
        frames.reshape(-1, 2, m, frames.shape[-1]), states,
        jnp.asarray(res0, jnp.int32), cfg, c)
    return (words.reshape(ch, m, words.shape[-1]),
            nbits.reshape(ch, m), t, res_steps)


def payload_to_frames_bs(data: bytes, offset: int, n_blocks: int,
                         cfg: CodecConfig) -> BsFrameCode:
    """Host-side deserializer. The field layout is state-independent except
    for the mantissa line→band map, so parsing stays fully vectorized."""
    from tac import bitstream as bs

    h, hs = cfg.n_mdct_lines, cfg.n_mdct_lines_short
    k_sub = h // hs
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    nb = bands.N_BANDS
    ch = cfg.n_channels
    k = n_blocks * ch
    offs, _ = bs.split_blocks(data, offset, k)
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    base = offs * 8

    head_w = np.concatenate([[2, s], np.full(nb, a)]).astype(np.int64)
    head_off = base[:, None] + np.concatenate(
        [[0, 2], 2 + s + a * np.arange(nb)])
    head = bs.unpack_at(bits, head_off.ravel(), np.tile(head_w, k)
                        ).reshape(k, 2 + nb)
    state, ovs, alloc_code = head[:, 0], head[:, 1], head[:, 2:]
    alloc = np.where(alloc_code > 0, alloc_code + 1, 0)

    sf_w = np.where(alloc > 0, s, 0).astype(np.int64)
    sf_end = np.cumsum(sf_w, axis=1)
    sf_off = base[:, None] + (2 + s + a * nb) + (sf_end - sf_w)
    sf = bs.unpack_at(bits, sf_off.ravel(), sf_w.ravel()).reshape(k, nb)

    bol_l = bands.band_of_line(cfg.sample_rate, h)
    bol_g = np.tile(bands.band_of_line(cfg.sample_rate, hs), k_sub)
    bol = np.where((state == SHORT)[:, None], bol_g[None, :], bol_l[None, :])
    m_line = np.take_along_axis(alloc, bol, axis=1).astype(np.int64)
    m_end = np.cumsum(m_line, axis=1)
    m_off = base[:, None] + (2 + s + a * nb) + sf_end[:, -1:] \
        + (m_end - m_line)
    mant = bs.unpack_at(bits, m_off.ravel(), m_line.ravel()).reshape(k, h)

    def to_cf(x):
        return jnp.asarray(np.ascontiguousarray(
            x.reshape(n_blocks, ch, *x.shape[1:]).swapaxes(0, 1)
        ).astype(np.int32))

    fc = FrameCode(ovs=to_cf(ovs), alloc_code=to_cf(alloc_code),
                   scale=to_cf(sf), mant=to_cf(mant))
    return BsFrameCode(state=to_cf(state), long=fc, short=fc)


# ------------------------------------------------------------- clip level ---

@partial(jax.jit, static_argnums=(1,))
def _encode_clip_bs_impl(x, cfg: CodecConfig) -> BsFrameCode:
    c = make_bs_consts(cfg)
    h = cfg.n_mdct_lines
    xt = x.astype(c.cl.dtype)
    frames = fb.frame_signal(xt, h)                      # [C, F, N]
    f = frames.shape[-2]
    states = window_states(transient_flags(xt, cfg), f)  # [C, F]
    enc = jax.vmap(jax.vmap(
        lambda fr, st: encode_frame_bs(fr, st, cfg, c)))
    return enc(frames, states)


def encode_clip_bs(x, cfg: CodecConfig) -> BsFrameCode:
    return _encode_clip_bs_impl(x, cfg)


@partial(jax.jit, static_argnums=(1, 2))
def _decode_clip_bs_impl(bc: BsFrameCode, cfg: CodecConfig, t: int):
    c = make_bs_consts(cfg)
    dec = jax.vmap(jax.vmap(lambda fc: decode_frame_bs(fc, cfg, c)))
    y = dec(bc)                                          # [C, F, N]
    return fb.overlap_add(y, cfg.n_mdct_lines, t)


def decode_clip_bs(bc: BsFrameCode, cfg: CodecConfig, t: int):
    return _decode_clip_bs_impl(bc, cfg, t)


def _unpack_bs_fields(wf, cfg: CodecConfig, c: BsConsts) -> BsFrameCode:
    """Device block-switch field unpack: uint32[K, W32] rows → BsFrameCode
    [K, ...] (SPEC.md §9 layout: [2-bit state | §7 fields]; the line→band
    map is selected per row by the decoded window state). Integer-exact vs
    the host deserializer (tests/test_device_decode)."""
    from tac.ops.bitunpack import read_fields

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    nb = bands.N_BANDS
    k = wf.shape[0]

    head_off = jnp.concatenate([
        jnp.asarray([0, 2], jnp.int32),
        2 + s + a * jnp.arange(nb, dtype=jnp.int32)])
    head_wid = jnp.concatenate([jnp.asarray([2, s], jnp.int32),
                                jnp.full(nb, a, jnp.int32)])
    head = read_fields(wf, jnp.broadcast_to(head_off, (k, nb + 2)),
                       jnp.broadcast_to(head_wid, (k, nb + 2)))
    state, ovs, alloc_code = head[:, 0], head[:, 1], head[:, 2:]
    alloc = codec_mod.ba.code_to_alloc(alloc_code)

    sf_w = jnp.where(alloc > 0, s, 0).astype(jnp.int32)
    sf_end = jnp.cumsum(sf_w, axis=1)
    sf = read_fields(wf, (2 + s + a * nb) + (sf_end - sf_w), sf_w)

    # per-row line→band map: grouped short map for SHORT rows, long else
    # (two static-index takes + select, not a per-row dynamic gather)
    m_line = jnp.where((state == SHORT)[:, None],
                       jnp.take(alloc, c.cg.band_of_line, axis=1),
                       jnp.take(alloc, c.cl.band_of_line, axis=1)
                       ).astype(jnp.int32)
    m_end = jnp.cumsum(m_line, axis=1)
    mant = read_fields(wf, (2 + s + a * nb) + sf_end[:, -1:]
                       + (m_end - m_line), m_line)

    fc = codec_mod.FrameCode(ovs=ovs, alloc_code=alloc_code, scale=sf,
                             mant=mant)
    return BsFrameCode(state=state, long=fc, short=fc)


@partial(jax.jit, static_argnums=(1, 2))
def _decode_clip_bs_packed_impl(words, cfg: CodecConfig, t: int):
    """words: uint32[C, F, W32] block-switch payload rows → [C, T], fully on
    device (decode mirror of _encode_clip_bs_packed_impl)."""
    c = make_bs_consts(cfg)
    h = cfg.n_mdct_lines
    lead = words.shape[:-1]                              # [C, F]
    bc = _unpack_bs_fields(words.reshape(-1, words.shape[-1]), cfg, c)
    y = jax.vmap(lambda b: decode_frame_bs(b, cfg, c))(bc)    # [K, N]
    out = fb.overlap_add(y.reshape(*lead, 2 * h), h, t)
    return codec_mod.ms_inverse(out) if cfg.stereo_mode == "ms" else out


@partial(jax.jit, static_argnums=(1,))
def _decode_frames_bs(words, cfg: CodecConfig):
    """uint32[..., W32] bs payload rows → [..., 2H] frame audio (no
    overlap-add — the streaming decoder carries the tail as state)."""
    c = make_bs_consts(cfg)
    lead = words.shape[:-1]
    bc = _unpack_bs_fields(words.reshape(-1, words.shape[-1]), cfg, c)
    y = jax.vmap(lambda b: decode_frame_bs(b, cfg, c))(bc)
    return y.reshape(*lead, 2 * cfg.n_mdct_lines)


@partial(jax.jit, static_argnums=(1,))
def _decode_frames_bs_vbr(words, cfg: CodecConfig):
    """uint32[..., W32] combo payload rows → [..., 2H] frame audio."""
    c = make_bs_consts(cfg)
    lead = words.shape[:-1]
    bc = _unpack_bs_vbr_fields(words.reshape(-1, words.shape[-1]), cfg, c)
    y = jax.vmap(lambda b: decode_frame_bs(b, cfg, c))(bc)
    return y.reshape(*lead, 2 * cfg.n_mdct_lines)


def decode_clip_bs_packed(words, cfg: CodecConfig, t: int):
    """uint32[C, F, W32] payload rows → [C, T] (block-switch streams)."""
    return _decode_clip_bs_packed_impl(words, cfg, t)
