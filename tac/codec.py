"""Codec core: per-frame encode/decode pipelines (SPEC.md §4–§6).

Capability parity with the reference's ``codec.py`` (SURVEY.md §2 #4:
Encode/EncodeSingleChannel/Decode), redesigned arrays-first for TPU:

  * the reference's serial per-block, per-channel loop becomes a pure
    per-frame function ``encode_frame`` vmapped over (channels, frames) —
    every frame is independent because the 50%-overlap state was moved into
    the framing (tac.dsp.mdct.frame_signal);
  * ``encode_clip``/``decode_clip`` are the jit entry points: one fused XLA
    graph from windowing to quantized integers (the BASELINE.json:5 mandate);
  * "parity" precision runs f64 with the FFT MDCT (bit-exact decision chain
    vs tac.oracle, SPEC.md §10); "fast" runs f32 with the window-fused
    matmul MDCT on the MXU.

The bitstream never appears here: encode produces integer arrays
(ovs, alloc codes, scale factors, mantissas) — the parity surface — and
tac.bitstream packs them host-side.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tac import bands, quant
from tac import bitalloc as ba
from tac import psy as psy_mod
from tac.config import CodecConfig
from tac.dsp import mdct as fb
from tac.dsp.window import window_fn


class CodecConsts(NamedTuple):
    """Host-built compile-time constants for one config (closed over by jit)."""
    window: jnp.ndarray          # [N] codec window
    fwd_basis: jnp.ndarray       # [N, H] window-fused MDCT basis (fast path)
    inv_basis: jnp.ndarray       # [H, N] window-fused IMDCT basis
    band_of_line: jnp.ndarray    # [H] int32
    n_lines: jnp.ndarray         # [N_BANDS] int32
    band_ranges: tuple           # ((start, end), ...) static line runs
    band_tile: int               # band map tiling: >1 = grouped shorts
    psy: Optional[psy_mod.PsyConsts]
    budget: int                  # python int: mantissa bits per block/channel
    mdct_gain: float             # 8 / mean(window^2), host float (SPEC §5)
    dtype: jnp.dtype


def ms_forward(x):
    """[..., C, T] (C even) L/R → M/S per adjacent channel PAIR:
    M = (L+R)/2, S = (L−R)/2 (SPEC.md §11). Channels (2p, 2p+1) butterfly
    into (mid_p, side_p) in place — stereo is the P=1 case, multichannel
    (quad, 5.1-without-LFE-pairing, …) butterflies every pair.

    The halving keeps M/S in [-1, 1) for full-scale correlated input; the
    inverse is the exact sum/difference (no half), so the butterfly round
    trip costs one rounding per sample — far below quantization noise."""
    ev, od = x[..., 0::2, :], x[..., 1::2, :]
    m = 0.5 * (ev + od)
    s = 0.5 * (ev - od)
    return jnp.stack([m, s], axis=-2).reshape(x.shape)


def ms_inverse(x):
    """[..., C, T] (C even) M/S → L/R per pair: L = M + S, R = M − S."""
    m, s = x[..., 0::2, :], x[..., 1::2, :]
    return jnp.stack([m + s, m - s], axis=-2).reshape(x.shape)


def frame_budget(cfg: CodecConfig, h: Optional[int] = None) -> int:
    """SPEC.md §6 per-(frame, channel) mantissa bit budget (2-bit tableId /
    windowState side fields come out of the budget in huffman / blockswitch
    modes). Pure host arithmetic — safe to call eagerly."""
    h = cfg.n_mdct_lines if h is None else h
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    b = (cfg.bitrate_bps * h) // (cfg.sample_rate * cfg.n_channels) \
        - s - bands.N_BANDS * (s + a) - (2 if cfg.use_block_switch else 0) \
        - (2 if cfg.use_huffman else 0)
    return max(int(b), 0)


def make_consts(cfg: CodecConfig, h: Optional[int] = None) -> CodecConsts:
    h = cfg.n_mdct_lines if h is None else h
    n = 2 * h
    dtype = jnp.float64 if cfg.precision == "parity" else jnp.float32
    w = window_fn(cfg.window, n, cfg.kbd_alpha)
    nl = bands.lines_per_band(cfg.sample_rate, h)
    budget = frame_budget(cfg, h)
    return CodecConsts(
        window=jnp.asarray(w, dtype),
        fwd_basis=jnp.asarray(fb.mdct_basis(h, w, np.float64), dtype),
        inv_basis=jnp.asarray(fb.imdct_basis(h, w, np.float64), dtype),
        band_of_line=jnp.asarray(bands.band_of_line(cfg.sample_rate, h)),
        n_lines=jnp.asarray(nl),
        band_ranges=bands.band_line_ranges(cfg.sample_rate, h),
        band_tile=1,
        psy=psy_mod.make_consts(cfg) if cfg.use_psy else None,
        budget=budget,
        mdct_gain=float(8.0 / np.mean(w ** 2)),
        dtype=dtype,
    )


class FrameCode(NamedTuple):
    """Quantized representation of one frame — the parity surface (SPEC §10)."""
    ovs: jnp.ndarray         # [] int32 overall scale factor
    alloc_code: jnp.ndarray  # [N_BANDS] int32 (0 ⇔ no bits, else alloc-1)
    scale: jnp.ndarray       # [N_BANDS] int32 (0 where alloc_code == 0)
    mant: jnp.ndarray        # [H] int32 line mantissas (0 where no bits)


def _band_max(x, c: CodecConsts, fill):
    """Per-band max of x[..., L] -> [..., N_BANDS], bit-identical to
    segment_max over c.band_of_line (max is order-independent) but as
    dense static-slice reduces (no scatter-max; PERF.md round-3 perf session). For
    grouped-short consts (band_tile = K sub-blocks, tiled band map) the
    line axis reshapes to [K, Hs] and the K sub-block maxes combine."""
    if c.band_tile == 1:
        return psy_mod.band_slice_max(x, c.band_ranges, fill)
    xs = x.reshape(*x.shape[:-1], c.band_tile, -1)
    return jnp.max(psy_mod.band_slice_max(xs, c.band_ranges, fill), axis=-2)


def _band_sum(x, c: CodecConsts):
    """Integer per-band sum (exact — int addition commutes), dense
    slices instead of scatter-add; grouped-short tiling as _band_max."""
    if c.band_tile == 1:
        return psy_mod.band_slice_sum(x, c.band_ranges)
    xs = x.reshape(*x.shape[:-1], c.band_tile, -1)
    return jnp.sum(psy_mod.band_slice_sum(xs, c.band_ranges), axis=-2)


def _smr_input(frame, lines, cfg: CodecConfig, c: CodecConsts):
    """What drives bit allocation (SPEC §5/§6; reference's 4 BitAlloc modes)."""
    if cfg.use_psy and cfg.alloc_mode in ("greedy", "const_mnr"):
        return psy_mod.calc_smrs(frame, lines, c.psy)
    if cfg.alloc_mode == "const_snr":
        spl = psy_mod.spl_from_intensity(c.mdct_gain * lines * lines)
        return _band_max(spl, c, -jnp.inf)
    return jnp.zeros(bands.N_BANDS, c.dtype)  # uniform


def analyze_frame(frame, cfg: CodecConfig, c: CodecConsts):
    """frame: [N] time samples (unwindowed) → (mdct lines [H], smr [B])."""
    with jax.named_scope("tac.mdct"):
        if cfg.precision == "parity":
            lines = fb.mdct_fft(frame * c.window, c.window.shape[0] // 2)
        else:
            lines = jnp.dot(frame, c.fwd_basis,
                            preferred_element_type=c.fwd_basis.dtype)

    with jax.named_scope("tac.psy"):
        smr = _smr_input(frame, lines, cfg, c)
    return lines, smr


def encode_frame(frame, cfg: CodecConfig, c: CodecConsts,
                 budget=None) -> FrameCode:
    """frame: [N] time samples (unwindowed) → FrameCode. Pure, vmappable.

    budget: optional traced int32 override of the static per-frame mantissa
    budget (used by the VBR bit-reservoir scan, SPEC.md §8).
    """
    lines, smr = analyze_frame(frame, cfg, c)
    return quantize_lines(lines, smr, cfg, c, budget)


def quantize_lines(lines, smr, cfg: CodecConfig, c: CodecConsts,
                   budget=None) -> FrameCode:
    """The decision chain: lines + SMRs → quantized FrameCode (SPEC §4–§6).

    Shared by the long path, the block-switch sub-block path, and the VBR
    scan. Integer-exact given identical float inputs (SPEC §10 item 1).
    """
    with jax.named_scope("tac.bitalloc"):
        alloc = ba.allocate(smr, c.n_lines,
                            c.budget if budget is None else budget,
                            cfg.alloc_mode, cfg.max_mant_bits)
    return quantize_given_alloc(lines, alloc, cfg, c)


def quantize_given_alloc(lines, alloc, cfg: CodecConfig,
                         c: CodecConsts) -> FrameCode:
    """lines + final per-band allocation → FrameCode (SPEC §4, §6)."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    nb = c.n_lines.shape[0]
    ovs = quant.scale_factor(jnp.max(jnp.abs(lines)), s, a)
    # 2^ovs is a power-of-two scale: exact in every float format (SPEC §10)
    scaled = lines * jnp.exp2(ovs.astype(lines.dtype))
    band_max = _band_max(jnp.abs(scaled), c, 0.0)
    band_max = jnp.where(c.n_lines > 0, band_max, 0.0)
    sf = quant.scale_factor(band_max, s, alloc)
    sf = jnp.where(alloc > 0, sf, 0)

    m_line = alloc[c.band_of_line]
    sf_line = sf[c.band_of_line]
    mant = quant.mantissa(scaled, sf_line, s, m_line)
    return FrameCode(ovs=ovs, alloc_code=ba.alloc_to_code(alloc),
                     scale=sf, mant=mant)


def decode_frame(code: FrameCode, cfg: CodecConfig, c: CodecConsts):
    """FrameCode → [N] windowed time-domain output (pre-overlap-add)."""
    s = cfg.n_scale_bits
    alloc = ba.code_to_alloc(code.alloc_code)
    m_line = alloc[c.band_of_line]
    sf_line = code.scale[c.band_of_line]
    scaled = quant.dequantize_mantissa(code.mant, sf_line, s, m_line, c.dtype)
    lines = scaled * jnp.exp2(-code.ovs.astype(c.dtype))
    if cfg.precision == "parity":
        return fb.imdct_fft(lines, lines.shape[-1]) * c.window
    return jnp.dot(lines, c.inv_basis,
                   preferred_element_type=c.inv_basis.dtype)


# --------------------------------------------------------- chunked encode ---

# Max frame-rows per compiled program instance; lax.map chunks keep memory
# bounded for arbitrarily long clips/batches (SURVEY.md §5.7). 2048
# measures ~+15% full path but some backends (this box's tunneled TPU
# worker) fault intermittently past ~1.7k rows/program, so the effective
# value is AUTO-TUNED: TAC_ENC_CHUNK env overrides, else a persistent
# per-backend probe verdict picks 2048 (healthy) or 1024 (known-faulty).
# Read at TRACE time — one value per process (tac/tuning.py).
def _enc_chunk() -> int:
    from tac import tuning

    return tuning.enc_chunk()


def _use_pallas_alloc(cfg: CodecConfig) -> bool:
    """Gate for the Pallas water-fill kernel (tac/ops/pallas_alloc.py):
    fast-precision rows on a real TPU backend (the kernel is f32; parity
    mode stays on the f64 XLA loop). TAC_PALLAS_ALLOC=0 disables — read
    at TRACE time (set it before the first encode; an already-jitted
    config won't retrace on a later env change)."""
    import os

    if cfg.precision == "parity" or os.environ.get("TAC_PALLAS_ALLOC") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _encode_rows_chunk(frames_chunk, cfg: CodecConfig, c: CodecConsts):
    """[M, N] frame rows → FrameCode [M, ...]: one fused program. On TPU
    fast paths the allocation while_loop runs as one Pallas kernel over
    the whole row block (launch-latency-bound otherwise, PERF.md)."""
    if not _use_pallas_alloc(cfg):
        return jax.vmap(lambda fr: encode_frame(fr, cfg, c))(frames_chunk)
    from tac.ops.pallas_alloc import water_fill_rows

    lines, smr = jax.vmap(lambda fr: analyze_frame(fr, cfg, c))(frames_chunk)
    smr_eff = jnp.zeros_like(smr) if cfg.alloc_mode == "uniform" else smr
    smr_q = ba.snap_smr(smr_eff)
    # warm start runs IN-KERNEL (warm_start_tile) from the raw budgets —
    # the external XLA bisection was ~64 sequential fusions per chunk
    a0 = jnp.zeros(smr_q.shape, jnp.int32)
    r0 = jnp.full(smr_q.shape[:1], c.budget, jnp.int32)
    alloc = water_fill_rows(smr_q, c.n_lines, a0, r0,
                            max_mant=cfg.max_mant_bits,
                            nb=int(c.n_lines.shape[0]),
                            warm=ba._USE_WARM_START)
    return jax.vmap(lambda l, al: quantize_given_alloc(l, al, cfg, c))(
        lines, alloc)


def _joint_alloc_pair_rows(smr, n_lines, budget: int, cfg: CodecConfig):
    """Joint M/S allocation over pair-adjacent rows (SPEC.md §11).

    smr f[M, B] with channel PAIRS adjacent along the row axis (row 2i =
    mid, 2i+1 = side of frame i), n_lines i32[B] shared or i32[M, B]
    per-row (the blockswitch state-selected maps; a pair's two rows
    always carry the SAME map — the window state is shared per pair) →
    alloc i32[M, B]. ONE water-fill over the pair's concatenated 2B
    bands sharing 2·budget — the same greedy decision chain as the
    per-channel path (tie-breaks order mid's bands before side's), so
    the serial oracle replays it on the concatenated arrays exactly."""
    m, nb = smr.shape
    smr2 = smr.reshape(m // 2, 2 * nb)
    if n_lines.ndim == 2:
        nl2 = n_lines.reshape(m // 2, 2 * nb)
    else:
        nl2 = jnp.concatenate([n_lines, n_lines])
    budget2 = 2 * budget
    if _use_pallas_alloc(cfg):
        from tac.ops.pallas_alloc import water_fill_rows

        smr_eff = jnp.zeros_like(smr2) if cfg.alloc_mode == "uniform" \
            else smr2
        smr_q = ba.snap_smr(smr_eff)
        a0 = jnp.zeros(smr_q.shape, jnp.int32)
        r0 = jnp.full(smr_q.shape[:1], budget2, jnp.int32)
        alloc2 = water_fill_rows(smr_q, nl2, a0, r0,
                                 max_mant=cfg.max_mant_bits,
                                 nb=2 * nb, warm=ba._USE_WARM_START)
    elif nl2.ndim == 2:
        alloc2 = jax.vmap(lambda s_, n_: ba.allocate(
            s_, n_, budget2, cfg.alloc_mode, cfg.max_mant_bits))(smr2, nl2)
    else:
        alloc2 = jax.vmap(lambda s_: ba.allocate(
            s_, nl2, budget2, cfg.alloc_mode, cfg.max_mant_bits))(smr2)
    return alloc2.reshape(m, nb)


def _joint_alloc_pairs(smr, cfg: CodecConfig, c: CodecConsts):
    """Flat-path joint M/S allocation: _joint_alloc_pair_rows at the
    clip consts' shared band map and budget."""
    return _joint_alloc_pair_rows(smr, c.n_lines, c.budget, cfg)


def _encode_pair_rows_chunk(frames_chunk, cfg: CodecConfig, c: CodecConsts):
    """[M, N] frame rows, channel pairs adjacent → FrameCode [M, ...] with
    the allocation made jointly per pair (the M/S encode chunk)."""
    lines, smr = jax.vmap(lambda fr: analyze_frame(fr, cfg, c))(frames_chunk)
    alloc = _joint_alloc_pairs(smr, cfg, c)
    return jax.vmap(lambda l, al: quantize_given_alloc(l, al, cfg, c))(
        lines, alloc)


def _encode_rows(frames_flat, cfg: CodecConfig, c: CodecConsts):
    """frames_flat: [R, N] → FrameCode with [R, ...] leaves, computed in
    lax.map chunks of _enc_chunk() rows."""
    chunk = _enc_chunk()
    r = frames_flat.shape[0]
    if r <= chunk:
        return _encode_rows_chunk(frames_flat, cfg, c)
    pad = (-r) % chunk
    fp = jnp.pad(frames_flat, ((0, pad), (0, 0)))
    chunks = fp.reshape(-1, chunk, fp.shape[-1])
    out = jax.lax.map(
        lambda fc: _encode_rows_chunk(fc, cfg, c), chunks)
    return jax.tree_util.tree_map(
        lambda l: l.reshape(-1, *l.shape[2:])[:r], out)


def _encode_rows_to_words(frames_flat, cfg: CodecConfig, c: CodecConsts,
                          pair: bool = False):
    """frames_flat: [R, N] → (words uint32[R, W32], nbits int32[R]) with
    the payload-field build and bit pack INSIDE each lax.map chunk.

    Bit-identical to _encode_rows → payload_fields → pack_rows (every op
    is per-row; only the chunk boundary moves), but the FrameCode leaves
    (mant is [R, H] i32 — ~340 MB at corpus batch sizes) and the
    [R, 1+2B+H] vals/wids field matrices never materialize at full size:
    the one-shot pack's whole-array concatenate/cumsum/relayout passes
    were ~27% of the fixed-rate batch device time (PERF.md round-3
    continuation session). Each chunk emits only its packed words.

    pair=True: rows carry channel PAIRS adjacently and allocation runs
    jointly per pair (M/S mode; R and the chunk size are both even, so
    pairs never split across a chunk boundary)."""
    from tac.ops.bitpack import pack_rows

    cap = payload_capacity_bits(cfg, c)
    enc_chunk_fn = _encode_pair_rows_chunk if pair else _encode_rows_chunk

    def chunk_words(fc):
        code = enc_chunk_fn(fc, cfg, c)
        vals, wids = payload_fields(code, cfg, c)
        return pack_rows(vals, wids, cap)

    chunk = _enc_chunk()
    r = frames_flat.shape[0]
    if r <= chunk:
        return chunk_words(frames_flat)
    pad = (-r) % chunk
    fp = jnp.pad(frames_flat, ((0, pad), (0, 0)))
    chunks = fp.reshape(-1, chunk, fp.shape[-1])
    words, nbits = jax.lax.map(chunk_words, chunks)
    return (words.reshape(-1, words.shape[-1])[:r],
            nbits.reshape(-1)[:r])


# ------------------------------------------------- device-packed payloads ---

def payload_fields(code: FrameCode, cfg: CodecConfig, c: CodecConsts):
    """Device-side (vals, wids) field matrices per SPEC.md §7 raw layout:
    ovs | B alloc codes | B scale factors (0-width where alloc=0) |
    H mantissas (width = band alloc). Leaves [..., NF] with NF = 1+2B+H.
    Byte-rounding pad is implicit (buffer is zeroed)."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    alloc = ba.code_to_alloc(code.alloc_code)
    m_line = alloc[..., c.band_of_line]
    ones = jnp.ones_like(code.alloc_code)
    vals = jnp.concatenate([code.ovs[..., None], code.alloc_code,
                            code.scale, code.mant], axis=-1)
    wids = jnp.concatenate([jnp.full_like(code.ovs[..., None], s),
                            ones * a, jnp.where(alloc > 0, s, 0),
                            m_line], axis=-1)
    return vals, wids


def vbr_mantissa_pairs(mant, m_line, tid, n_sets: int = 2):
    """Device huffman-or-raw mantissa field pairs (SPEC.md §8).

    mant, m_line: int32[..., H]; tid: int32[...] (0 = raw, 1..3 = trained
    sets). Returns (vals, wids) int32[..., 2H]: the chosen set's huffman
    codeword + escape-raw pairs where tid >= 1, a raw m_line-bit field
    (second field width 0) where tid == 0. n_sets bounds which set
    encoders may have picked (static; extra selects vanish at 1)."""
    from tac import huffman as hf

    hv, hw = hf.encode_fields_device(mant, m_line)
    for sid in range(2, n_sets + 1):
        hv_s, hw_s = hf.encode_fields_device(mant, m_line, set_id=sid)
        here = (tid == sid)[..., None, None]
        hv = jnp.where(here, hv_s, hv)
        hw = jnp.where(here, hw_s, hw)
    raw = (tid == 0)[..., None]
    v0 = jnp.where(raw, mant, hv[..., 0])
    w0 = jnp.where(raw, m_line, hw[..., 0])
    v1 = jnp.where(raw, 0, hv[..., 1])
    w1 = jnp.where(raw, 0, hw[..., 1])
    shp = (*mant.shape[:-1], 2 * mant.shape[-1])
    return (jnp.stack([v0, v1], axis=-1).reshape(shp),
            jnp.stack([w0, w1], axis=-1).reshape(shp))


def payload_fields_vbr(code: FrameCode, tid, cfg: CodecConfig,
                       c: CodecConsts):
    """Device-side (vals, wids) per SPEC.md §7 huffman layout:
    ovs | 2-bit tableId | B alloc codes | B scale factors | huffman-or-raw
    mantissa pairs. Leaves [..., NF] with NF = 2+2B+2H. Byte-exact with the
    host serializer api.frames_to_payload_vbr (tests/test_huffman.py)."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    alloc = ba.code_to_alloc(code.alloc_code)
    m_line = alloc[..., c.band_of_line].astype(jnp.int32)
    hv, hw = vbr_mantissa_pairs(code.mant, m_line, tid, cfg.huffman_sets)
    ones = jnp.ones_like(code.alloc_code)
    vals = jnp.concatenate([code.ovs[..., None], tid[..., None],
                            code.alloc_code, code.scale, hv], axis=-1)
    wids = jnp.concatenate([jnp.full_like(code.ovs[..., None], s),
                            jnp.full_like(tid[..., None], 2),
                            ones * a, jnp.where(alloc > 0, s, 0), hw],
                           axis=-1)
    return vals, wids


def payload_capacity_bits(cfg: CodecConfig,
                          c: Optional[CodecConsts] = None) -> int:
    nb = bands.N_BANDS
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    head = s + nb * (a + s) + (2 if cfg.use_huffman else 0)
    budget = c.budget if c is not None else frame_budget(cfg)
    # joint M/S allocation can hand one channel the PAIR's whole budget
    if cfg.stereo_mode == "ms":
        budget *= 2
    budget_max = budget * ((1 + cfg.reservoir_factor)
                           if cfg.use_huffman else 1)
    return head + budget_max + 32


def _encode_clip_packed_impl(x, cfg: CodecConfig):
    """Encode + bit-pack entirely on device: only payload words + bit counts
    cross the device→host link (SURVEY.md §3.5 boundary minimization)."""
    return _encode_packed_leading(x, cfg)


@partial(jax.jit, static_argnums=(1,))
def _encode_packed_leading(x, cfg: CodecConfig):
    """x: [..., C, T] → (words [..., C, F, W32], nbits [..., C, F]).

    All leading axes (batch, channels, frames) flatten into one row axis
    so the auto-tuned row chunk bounds the per-program size regardless
    of batch shape (_enc_chunk, tac/tuning.py). M/S mode transforms the
    channel pair, interleaves rows frame-major so each pair is adjacent,
    and allocates jointly (SPEC.md §11) — the emitted per-channel payload
    layout is UNCHANGED (only the transform flag in the header differs).
    """
    c = make_consts(cfg)
    xt = x.astype(c.dtype)
    if cfg.stereo_mode == "ms":
        xt = ms_forward(xt)
    frames = fb.frame_signal(xt, cfg.n_mdct_lines)
    lead = frames.shape[:-1]                   # [..., C, F]
    if cfg.stereo_mode == "ms":
        fr = jnp.swapaxes(frames, -3, -2)      # [..., F, C, N]: pairs adjacent
        words, nbits = _encode_rows_to_words(
            fr.reshape(-1, fr.shape[-1]), cfg, c, pair=True)
        words = jnp.swapaxes(
            words.reshape(*fr.shape[:-1], words.shape[-1]), -3, -2)
        return words, jnp.swapaxes(nbits.reshape(fr.shape[:-1]), -2, -1)
    words, nbits = _encode_rows_to_words(
        frames.reshape(-1, frames.shape[-1]), cfg, c)
    return (words.reshape(*lead, words.shape[-1]),
            nbits.reshape(lead))


def encode_clip_packed(x, cfg: CodecConfig):
    """x: [C, T] → (words uint32[C, F, W32], nbits int32[C, F])."""
    return _encode_clip_packed_impl(x, cfg)


@partial(jax.jit, static_argnums=(1,))
def _encode_frames_packed(frames, cfg: CodecConfig):
    """Pre-framed rows [..., F, N] → (words [..., F, W32], nbits [..., F]).

    The streaming encoder's batched core (tac/streaming.py): identical
    decision chain and packer as the offline clip path, so the emitted
    stream bytes equal the offline bytes by construction.
    """
    c = make_consts(cfg)
    lead = frames.shape[:-1]
    words, nbits = _encode_rows_to_words(
        frames.reshape(-1, frames.shape[-1]).astype(c.dtype), cfg, c)
    return words.reshape(*lead, words.shape[-1]), nbits.reshape(lead)


def _frames_from_halves(prior, halves, dtype):
    """prior [C, H] + halves [C, m, H] → frames [C, m, N]: frame j =
    [h_{j-1} | h_j]. Built ON DEVICE so a streaming push uploads only the
    new halves (half the bytes of pre-built 50%-overlap frames)."""
    seq = jnp.concatenate([prior.astype(dtype)[:, None],
                           halves.astype(dtype)], axis=1)
    return jnp.concatenate([seq[:, :-1], seq[:, 1:]], axis=-1)


@partial(jax.jit, static_argnums=(2,))
def _encode_frames_packed_halves(prior, halves, cfg: CodecConfig):
    """Streaming raw core: (prior [C, H], halves [C, m, H]) →
    (words [C, m, W32], nbits [C, m]); frames form on device."""
    c = make_consts(cfg)
    return _encode_frames_packed(_frames_from_halves(prior, halves,
                                                     c.dtype), cfg)


@partial(jax.jit, static_argnums=(3,))
def _encode_frames_vbr_packed(prior, halves, res0, cfg: CodecConfig):
    """Streaming VBR core, fully device-packed: (prior [C, H], halves
    [C, m, H], reservoir fills res0 [C]) → (words [C, m, W32],
    nbits [C, m], res_steps [C, m]).

    Same reservoir chain + field pack as the offline
    _encode_vbr_packed_leading (stream bytes == offline bytes), but
    resumed from carried fills and fed by on-device frame forming — a
    push uploads H·m samples and pulls packed words (~the bitstream),
    not FrameCode integer arrays (VERDICT r2 item 2: the host-pack
    streaming path pulled ~20x the payload per push).
    """
    from tac import huffman as hf
    from tac.ops.bitpack import pack_rows

    c = make_consts(cfg)
    cost_tab = cost_tables(cfg)
    frames = _frames_from_halves(prior, halves, c.dtype)
    codes, tids, _, res_steps = _encode_vbr_lanes(
        frames, jnp.asarray(res0, jnp.int32), cfg, c, cost_tab)
    # push sizes are far below the chunk bound, so the one-shot field
    # build here is already a single fused graph — no lax.map boundary
    vals, wids = payload_fields_vbr(codes, tids, cfg, c)
    words, nbits = pack_rows(vals, wids, payload_capacity_bits(cfg, c))
    return words, nbits, res_steps


@partial(jax.jit, static_argnums=(2,))
def _encode_frames_ms_packed_halves(prior, halves, cfg: CodecConfig):
    """Streaming M/S fixed-rate core (SPEC.md §11): (prior [C, H] L/R,
    halves [C, m, H] L/R, C even) → (words [C, m, W32], nbits [C, m]).

    Frames form on device from the L/R halves, THEN the butterfly runs
    (per-sample, so it commutes with framing — bit-identical to the
    offline path's butterfly-then-frame order at the same dtype), and
    the joint pair allocation rides _encode_rows_to_words(pair=True)
    exactly as offline."""
    c = make_consts(cfg)
    frames = _frames_from_halves(prior, halves, c.dtype)   # [2, m, N] L/R
    fr = ms_forward(jnp.swapaxes(frames, 0, 1))            # [m, 2, N] M/S
    words, nbits = _encode_rows_to_words(
        fr.reshape(-1, fr.shape[-1]), cfg, c, pair=True)
    words = jnp.swapaxes(
        words.reshape(*fr.shape[:-1], words.shape[-1]), 0, 1)
    return words, jnp.swapaxes(nbits.reshape(fr.shape[:-1]), 0, 1)


@partial(jax.jit, static_argnums=(3,))
def _encode_frames_ms_vbr_packed(prior, halves, res0, cfg: CodecConfig):
    """Streaming M/S joint-reservoir VBR core (SPEC.md §11 × §8):
    (prior [C, H] L/R, halves [C, m, H] L/R, res0 i32[P] carried joint
    fills, P = C//2 pairs) → (words [C, m, W32], nbits [C, m],
    res_steps i32[P, m]).

    Same joint chain as the offline _encode_vbr_ms_to_words, resumed
    from the carried fills — stream bytes == offline bytes."""
    c = make_consts(cfg)
    frames = _frames_from_halves(prior, halves, c.dtype)   # [C, m, N] L/R
    fr = ms_forward(jnp.swapaxes(frames, 0, 1))            # [m, C, N] M/S
    m, ch, n = fr.shape
    pf = jnp.swapaxes(fr, 0, 1).reshape(-1, 2, m, n)       # [P, 2, m, N]
    words, nbits, res_steps = _encode_vbr_ms_to_words(
        pf, cfg, c, jnp.asarray(res0, jnp.int32).reshape(ch // 2))
    return (words.reshape(ch, m, words.shape[-1]),
            nbits.reshape(ch, m), res_steps)


# ------------------------------------------------- device-packed decode -----

def _unpack_raw_fields(wf, cfg: CodecConfig, c: CodecConsts) -> FrameCode:
    """Device raw-layout field unpack: uint32[K, W32] rows → FrameCode
    [K, ...] (SPEC.md §7 fixed-rate layout). Fixed-offset head reads, then
    parallel cumsum-offset gathers for scale factors and mantissas."""
    from tac.ops.bitunpack import read_fields

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    nb = bands.N_BANDS
    k = wf.shape[0]

    head_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                s + a * jnp.arange(nb, dtype=jnp.int32)])
    head_wid = jnp.concatenate([jnp.full(1, s, jnp.int32),
                                jnp.full(nb, a, jnp.int32)])
    head = read_fields(wf, jnp.broadcast_to(head_off, (k, nb + 1)),
                       jnp.broadcast_to(head_wid, (k, nb + 1)))
    ovs, alloc_code = head[:, 0], head[:, 1:]
    alloc = ba.code_to_alloc(alloc_code)

    sf_w = jnp.where(alloc > 0, s, 0).astype(jnp.int32)
    sf_end = jnp.cumsum(sf_w, axis=1)
    sf = read_fields(wf, (s + a * nb) + (sf_end - sf_w), sf_w)

    m_line = alloc[:, c.band_of_line].astype(jnp.int32)  # [K, H]
    m_end = jnp.cumsum(m_line, axis=1)
    mant = read_fields(wf, (s + a * nb) + sf_end[:, -1:] + (m_end - m_line),
                       m_line)
    return FrameCode(ovs=ovs, alloc_code=alloc_code, scale=sf, mant=mant)


@partial(jax.jit, static_argnums=(1,))
def _decode_frames_packed(words, cfg: CodecConfig):
    """uint32[..., W32] raw payload rows → [..., 2H] frame audio (no
    overlap-add — the streaming decoder carries the tail as state)."""
    c = make_consts(cfg)
    lead = words.shape[:-1]
    code = _unpack_raw_fields(words.reshape(-1, words.shape[-1]), cfg, c)
    y = jax.vmap(lambda fc: decode_frame(fc, cfg, c))(code)   # [K, N]
    return y.reshape(*lead, 2 * cfg.n_mdct_lines)


@partial(jax.jit, static_argnums=(1,))
def _decode_frames_vbr(words, cfg: CodecConfig):
    """uint32[..., W32] VBR payload rows → [..., 2H] frame audio."""
    c = make_consts(cfg)
    lead = words.shape[:-1]
    code = _unpack_vbr_fields(words.reshape(-1, words.shape[-1]), cfg, c)
    y = jax.vmap(lambda fc: decode_frame(fc, cfg, c))(code)
    return y.reshape(*lead, 2 * cfg.n_mdct_lines)


@partial(jax.jit, static_argnums=(1, 2))
def _decode_clip_packed_impl(words, cfg: CodecConfig, t: int):
    """words: uint32[C, F, W32] payload rows → [C, T] audio, fully fused:
    on-device unpack (gathers) → dequantize → IMDCT → overlap-add. Only
    the payload words cross the host→device link (decode mirror of
    _encode_packed_leading; raw fixed-rate layout, SPEC.md §7)."""
    c = make_consts(cfg)
    h = cfg.n_mdct_lines
    lead = words.shape[:-1]                              # [C, F]
    code = _unpack_raw_fields(words.reshape(-1, words.shape[-1]), cfg, c)
    y = jax.vmap(lambda fc: decode_frame(fc, cfg, c))(code)   # [K, N]
    out = fb.overlap_add(y.reshape(*lead, 2 * h), h, t)
    return ms_inverse(out) if cfg.stereo_mode == "ms" else out


def decode_clip_packed(words, cfg: CodecConfig, t: int):
    """uint32[C, F, W32] payload rows → [C, T] (fixed-rate raw streams)."""
    return _decode_clip_packed_impl(words, cfg, t)


def _read_bits_at(words, pos, width):
    """Per-row dynamic bit read: words [K, W32], pos/width int32[K] →
    int32[K]. Same two-word merge as ops.bitunpack.read_fields, for traced
    scan offsets. Reads past the row end clip to the last word — harmless
    for canonical-Huffman peeks (every LUT entry sharing the true codeword
    prefix maps to the same symbol)."""
    w32 = words.shape[-1]
    word0 = (pos >> 5).astype(jnp.int32)
    r = (pos & 31).astype(jnp.uint32)
    hi = jnp.take_along_axis(words, jnp.clip(word0, 0, w32 - 1)[:, None],
                             axis=-1)[:, 0]
    lo = jnp.take_along_axis(words, jnp.clip(word0 + 1, 0, w32 - 1)[:, None],
                             axis=-1)[:, 0]
    merged = (hi << r) | jnp.where(r > 0, lo >> (32 - r), jnp.uint32(0))
    w = jnp.asarray(width, jnp.uint32)
    return jnp.where(w > 0, merged >> (32 - w), jnp.uint32(0)) \
        .astype(jnp.int32)


_PACKED_DEC_LUTS_CACHE: dict = {}


def _packed_dec_luts(set_id: int = 1):
    """Packed per-table decode LUTs (len << 16 | symbol) + escape symbols,
    built once per (process, table set) (VERDICT r2 weak item 6: this was
    re-run host-side at every (shape, cfg) trace)."""
    from tac import huffman as hf

    if set_id not in _PACKED_DEC_LUTS_CACHE:
        luts = hf._dec_luts(set_id)
        lmax = max(v[2] for v in luts.values())
        n_tab = hf.MAX_M - hf.MIN_M + 1
        pak_t = np.zeros((n_tab, 1 << lmax), np.int32)
        escs = np.zeros(n_tab, np.int32)
        for m in range(hf.MIN_M, hf.MAX_M + 1):
            sym_lut, len_lut, l, esc = luts[m]
            reps = 1 << (lmax - l)
            pak_t[m - hf.MIN_M] = np.repeat((len_lut << 16) | sym_lut, reps)
            escs[m - hf.MIN_M] = esc
        _PACKED_DEC_LUTS_CACHE[set_id] = (pak_t, escs, lmax)
    return _PACKED_DEC_LUTS_CACHE[set_id]


def _huffman_decode_scan(words, mant_start, m_line, set_id: int = 1):
    """Device canonical-Huffman mantissa decode (SPEC.md §8 decode walk).

    words: uint32[K, W32]; mant_start: int32[K] absolute bit offset of the
    mantissa run; m_line: int32[K, H]. The per-line codeword lengths chain
    the offsets, so the line axis is a lax.scan; all K rows decode in
    parallel lanes per step (the decode mirror of the encoder's reservoir
    scan). Returns int32[K, H].
    """
    from tac import huffman as hf

    pak_np, escs_np, lmax = _packed_dec_luts(set_id)
    # one PACKED lut (len << 16 | symbol): the per-step [K]-lane random
    # gather is the scan's bottleneck, so halve the gather count
    n_tab = hf.MAX_M - hf.MIN_M + 1
    pak_t = jnp.asarray(pak_np)
    escs = jnp.asarray(escs_np)

    def step(pos, m):
        codable = (m >= hf.MIN_M) & (m <= hf.MAX_M)
        tab = jnp.clip(m - hf.MIN_M, 0, n_tab - 1)
        peek = _read_bits_at(words, pos, jnp.full_like(pos, lmax))
        pak = pak_t[tab, peek]
        sym = pak & 0xFFFF
        ln = pak >> 16
        esc = codable & (sym == escs[tab])
        code_bits = jnp.where(codable, ln, 0)
        raw_bits = jnp.where(codable, jnp.where(esc, m, 0), m)
        rawv = _read_bits_at(words, pos + code_bits, raw_bits)
        val = jnp.where(codable & ~esc, sym, rawv)
        return pos + code_bits + raw_bits, val

    # NOT unrolled: measured on-chip, unroll=8 gave no gain (the scan is
    # bound by the serial gather chain, not loop dispatch)
    _, mant = jax.lax.scan(step, jnp.asarray(mant_start, jnp.int32),
                           jnp.asarray(m_line, jnp.int32).T)
    return mant.T                                        # [K, H]


def _unpack_vbr_fields(wf, cfg: CodecConfig, c: CodecConsts) -> FrameCode:
    """Device VBR field unpack: uint32[K, W32] rows → FrameCode [K, ...]
    (SPEC.md §7 huffman layout). Fixed-offset head reads, raw rows via
    parallel cumsum-offset gathers, Huffman rows via the line-axis decode
    scan. Integer-exact vs the host deserializer (tests/test_device_decode)."""
    from tac.ops.bitunpack import read_fields

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    nb = bands.N_BANDS
    k = wf.shape[0]

    head_off = jnp.concatenate([
        jnp.asarray([0, s], jnp.int32),
        s + 2 + a * jnp.arange(nb, dtype=jnp.int32)])
    head_wid = jnp.concatenate([jnp.asarray([s, 2], jnp.int32),
                                jnp.full(nb, a, jnp.int32)])
    head = read_fields(wf, jnp.broadcast_to(head_off, (k, nb + 2)),
                       jnp.broadcast_to(head_wid, (k, nb + 2)))
    ovs, tid, alloc_code = head[:, 0], head[:, 1], head[:, 2:]
    alloc = ba.code_to_alloc(alloc_code)

    sf_w = jnp.where(alloc > 0, s, 0).astype(jnp.int32)
    sf_end = jnp.cumsum(sf_w, axis=1)
    sf = read_fields(wf, (s + 2 + a * nb) + (sf_end - sf_w), sf_w)

    m_line = alloc[:, c.band_of_line].astype(jnp.int32)  # [K, H]
    mant_start = (s + 2 + a * nb) + sf_end[:, -1]
    m_end = jnp.cumsum(m_line, axis=1)
    mant_raw = read_fields(wf, mant_start[:, None] + (m_end - m_line),
                           m_line)
    mant = _huffman_or_raw(wf, mant_start, m_line, tid, mant_raw)
    return FrameCode(ovs=ovs, alloc_code=alloc_code, scale=sf, mant=mant)


def _huffman_or_raw(wf, mant_start, m_line, tid, mant_raw):
    """Select huffman-decoded or raw mantissas per row; each table set's
    decode walk runs only if the chunk HAS rows with that tid (nested
    lax.cond — real branches at this top-level trace, so all-raw streams
    never pay a walk and single-set streams pay one; VERDICT r2 item 3).
    On TPU each walk is the LUT-free Pallas kernel
    (tac/ops/pallas_huffdec.py, rows across the vector tile); elsewhere
    (or TAC_PALLAS_HUFFDEC=0, or H not lane-aligned, or retrained
    non-canonical tables) the lax.scan LUT walk."""
    import os

    from tac import huffman as hf

    def decoder_for(set_id: int):
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu and os.environ.get("TAC_PALLAS_HUFFDEC") != "0" \
                and m_line.shape[-1] % 128 == 0:
            try:
                from tac.ops.pallas_huffdec import (_canon_consts,
                                                    huffman_decode_rows)

                _canon_consts(set_id)       # raises on non-canonical tables
                return lambda *a: huffman_decode_rows(*a, set_id=set_id)
            except ValueError:
                pass
        return lambda *a: _huffman_decode_scan(*a, set_id=set_id)

    out = mant_raw
    for sid in range(1, hf.n_sets() + 1):
        dec = decoder_for(sid)
        out = jax.lax.cond(
            jnp.any(tid == sid),
            lambda out=out, dec=dec, sid=sid: jnp.where(
                (tid == sid)[:, None], dec(wf, mant_start, m_line), out),
            lambda out=out: out)
    return out


@partial(jax.jit, static_argnums=(1, 2))
def _decode_clip_vbr_packed_impl(words, cfg: CodecConfig, t: int):
    """words: uint32[C, F, W32] VBR payload rows → [C, T], fully on device:
    field unpack → dequantize → IMDCT → overlap-add, one fused graph."""
    c = make_consts(cfg)
    h = cfg.n_mdct_lines
    lead = words.shape[:-1]                              # [C, F]
    code = _unpack_vbr_fields(words.reshape(-1, words.shape[-1]), cfg, c)
    y = jax.vmap(lambda fc: decode_frame(fc, cfg, c))(code)   # [K, N]
    out = fb.overlap_add(y.reshape(*lead, 2 * h), h, t)
    return ms_inverse(out) if cfg.stereo_mode == "ms" else out


def decode_clip_vbr_packed(words, cfg: CodecConfig, t: int):
    """uint32[C, F, W32] VBR payload rows → [C, T] (huffman streams)."""
    return _decode_clip_vbr_packed_impl(words, cfg, t)


@partial(jax.jit, static_argnums=(3,))
def _decode_frames_stream(words, tail, m, cfg: CodecConfig):
    """Streaming decode core with ON-DEVICE overlap-add (tac/streaming.py).

    words uint32[C, mb, W32] payload rows (rows >= m are bucket padding),
    tail f[C, H] carried second halves, m int32 true frame count →
    (out f[C, mb, H] finalized sample rows, new_tail f[C, H] =
    seconds[:, m-1]). The per-push pull is halved vs pulling raw [.., 2H]
    frames and the add runs fused with the decode graph; family selected
    by cfg (same decoders as offline)."""
    if cfg.use_block_switch:
        from tac import blockswitch as bsw

        dec = (bsw._decode_frames_bs_vbr if cfg.use_huffman
               else bsw._decode_frames_bs)
    else:
        dec = _decode_frames_vbr if cfg.use_huffman else _decode_frames_packed
    y = dec(words, cfg)                                   # [C, mb, 2H]
    h = cfg.n_mdct_lines
    firsts, seconds = y[..., :h], y[..., h:]
    prev = jnp.concatenate([tail[:, None].astype(y.dtype),
                            seconds[:, :-1]], axis=1)
    new_tail = jax.lax.dynamic_index_in_dim(seconds, m - 1, axis=1,
                                            keepdims=False)
    out = firsts + prev
    if cfg.stereo_mode == "ms":
        # finalized rows are complete M/S samples: the inverse butterfly
        # is per-sample, so applying it here (tail stays M/S) equals the
        # offline ms_inverse-after-overlap-add exactly (SPEC.md §11);
        # pairwise over the leading channel axis (C even)
        m_, s_ = out[0::2], out[1::2]
        out = jnp.stack([m_ + s_, m_ - s_], axis=1).reshape(out.shape)
    return out, new_tail


# ----------------------------------------------------------- VBR (huffman) --

class VbrCode(NamedTuple):
    """FrameCode + per-frame entropy-coding decisions (SPEC.md §8)."""
    code: FrameCode
    table_id: jnp.ndarray    # [C, F] int32: 0 = raw, 1..3 = trained sets
    used_bits: jnp.ndarray   # [C, F] int32 mantissa payload bits actually used


def cost_tables(cfg: CodecConfig):
    """Per-set device cost tables the encoder prices with (SPEC.md §8):
    a tuple of [7, 256] int32, one per trained set in cfg.huffman_sets."""
    from tac import huffman as hf

    return tuple(hf.cost_table_jnp(sid)
                 for sid in range(1, cfg.huffman_sets + 1))


def _encode_channel_vbr(frames_1ch, res0, cfg: CodecConfig, c: CodecConsts,
                        cost_tab):
    """Bit-reservoir scan over one channel's frames (SPEC.md §8).

    The reservoir makes frames *sequentially* dependent — the one place the
    encoder is a lax.scan instead of a vmap. carry = reservoir fill (int32),
    starting at res0 (0 offline; the carried StreamState fill when the
    streaming encoder resumes mid-stream); per step: allocate with budget =
    base + reservoir, price the mantissas raw vs Huffman (device table
    gather), bank the savings. Returns per-step reservoir fills too so a
    caller that padded the frame axis can read the fill at its true end.
    """
    from tac import huffman as hf

    base = jnp.asarray(c.budget, jnp.int32)
    cap = jnp.asarray(cfg.reservoir_factor * c.budget, jnp.int32)

    # the analysis half (window+MDCT+psy) is frame-independent: hoist it
    # out of the scan as one batched vmap (MXU-friendly) so the serial
    # reservoir chain carries only the decision half — same ops, same
    # floats, bit-exact vs running encode_frame inside the step
    lines, smr = jax.vmap(lambda fr: analyze_frame(fr, cfg, c))(frames_1ch)

    def step(res, xs):
        ln, sm = xs
        code = quantize_lines(ln, sm, cfg, c, budget=base + res)
        m_line = ba.code_to_alloc(code.alloc_code)[c.band_of_line]
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
        return res2, (code, table_id, used, res2)

    _, (codes, tids, used, res_steps) = jax.lax.scan(
        step, jnp.asarray(res0, jnp.int32), (lines, smr))
    return codes, tids, used, res_steps


# --------------------------------------- VBR lane-batched reservoir scan ---

def _alloc_rows(smr, budgets, cfg: CodecConfig, n_lines):
    """Batched greedy allocation: smr f[R, B], budgets int32[R] (traced),
    n_lines int32[B] or per-row int32[R, B] (the combo's state-selected
    band maps) → alloc int32[R, B]. The Pallas water-fill kernel on TPU
    fast paths, the XLA while_loop otherwise — decisions identical
    (tests/test_pallas_alloc.py)."""
    per_row = n_lines.ndim == 2
    if not _use_pallas_alloc(cfg):
        if per_row:
            return jax.vmap(lambda s_, bg, nl: ba.allocate(
                s_, nl, bg, cfg.alloc_mode, cfg.max_mant_bits))(
                smr, budgets, n_lines)
        return jax.vmap(lambda s_, bg: ba.allocate(
            s_, n_lines, bg, cfg.alloc_mode, cfg.max_mant_bits))(
            smr, budgets)
    from tac.ops.pallas_alloc import water_fill_rows

    smr_eff = jnp.zeros_like(smr) if cfg.alloc_mode == "uniform" else smr
    smr_q = ba.snap_smr(smr_eff)
    a0 = jnp.zeros(smr_q.shape, jnp.int32)
    r0 = budgets.astype(jnp.int32)
    return water_fill_rows(smr_q, n_lines, a0, r0,
                           max_mant=cfg.max_mant_bits,
                           nb=int(n_lines.shape[-1]),
                           warm=ba._USE_WARM_START)


def _vbr_band_costs(lines, cfg: CodecConfig, c: CodecConsts):
    """Budget-independent half of VBR pricing, batched over frame rows.

    The reservoir scan's step must price raw-vs-Huffman at the step's
    allocation — but the mantissa a line would get at band allocation m
    depends only on (lines, m): ovs, the scaled spectrum, and each band's
    block-FP scale factor are all budget-free. So the per-band Huffman
    cost at EVERY codable candidate m ∈ [MIN_M, MAX_M] is precomputed
    here, in parallel, outside the serial chain; the step then prices an
    allocation with a 7-way select over [B] bands (_vbr_price) instead of
    quantizing + gathering over [H] lines per step.

    lines f[R, H] → (bits_huf int32[R, B, 7·S] — coded band cost at
    m = 2..8 for each of the S = cfg.huffman_sets trained table sets
    (set s occupies columns [7(s-1), 7s)); cost = m·n_lines for
    non-codable m handled in _vbr_price). Symbol cost lookups are
    select-sums over the ≤2^m static table entries, not gathers (the TPU
    gather lesson, PERF.md). The quantized candidate mantissas are shared
    across sets — only the cost rows differ.
    """
    from tac import huffman as hf

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    nb = c.n_lines.shape[0]
    ovs = jax.vmap(lambda l: quant.scale_factor(
        jnp.max(jnp.abs(l)), s, a))(lines)                  # [R]
    scaled = lines * jnp.exp2(ovs.astype(lines.dtype))[:, None]
    band_max = _band_max(jnp.abs(scaled), c, 0.0)
    band_max = jnp.where(c.n_lines > 0, band_max, 0.0)      # [R, B]

    cost_nps = [hf.cost_table_np(sid)                       # S x [7, 256]
                for sid in range(1, cfg.huffman_sets + 1)]
    outs = [[] for _ in cost_nps]
    for m in range(hf.MIN_M, hf.MAX_M + 1):
        sf_m = quant.scale_factor(band_max, s, m)           # [R, B]
        mant_m = quant.mantissa(scaled, sf_m[:, c.band_of_line], s, m)
        for si, cost_np in enumerate(cost_nps):
            # run-decomposed row: ~4x fewer fused elementwise passes than
            # the per-symbol select chain (127 runs vs 508 symbols, PERF.md)
            c0, runs = hf.run_decompose(cost_np[m - hf.MIN_M][: 1 << m])
            cost = hf._apply_runs(mant_m, c0, runs)
            outs[si].append(_band_sum(cost, c))  # int32: slice-sum exact
    return jnp.concatenate(
        [jnp.stack(o, axis=-1) for o in outs], axis=-1)     # [R, B, 7S]


def _vbr_price(alloc, bits_huf, n_lines):
    """alloc int32[L, B], bits_huf int32[L, B, 7·S], n_lines int32[B] or
    [L, B] → (raw int32[L], hufs int32[L, S]) — one coded total per
    trained table set.

    Integer-identical to huffman.frame_mantissa_costs on the mantissas
    quantize_given_alloc would emit at `alloc` (asserted via the byte-
    parity suite): raw = Σ_b alloc·n_lines; each set swaps in its
    precomputed coded band cost for codable allocations."""
    from tac import huffman as hf

    n_tab = hf.MAX_M - hf.MIN_M + 1
    n_sets = bits_huf.shape[-1] // n_tab
    raw_b = alloc * n_lines                                 # [L, B]
    hufs = []
    for si in range(n_sets):
        huf_b = raw_b                                       # non-codable: raw
        for m in range(hf.MIN_M, hf.MAX_M + 1):
            huf_b = jnp.where(alloc == m,
                              bits_huf[..., si * n_tab + m - hf.MIN_M],
                              huf_b)
        hufs.append(jnp.sum(huf_b, -1))
    return jnp.sum(raw_b, -1), jnp.stack(hufs, -1)


def _map_row_chunks(fn, arrs, r: int, chunk: Optional[int] = None):
    """Apply fn(*row_chunks) over _enc_chunk()-row chunks of [R, ...]
    arrays (lax.map past the chunk bound — the same program-size cap as
    _encode_rows), concatenating the [chunk, ...] results back to [R, ...].
    chunk overrides the auto-tuned size (paths whose per-row program is
    heavier than the probe's shrink it — the tuned value proxies
    per-program size, not row count)."""
    chunk = _enc_chunk() if chunk is None else chunk
    if r <= chunk:
        return fn(*arrs)
    pad = (-r) % chunk
    chunks = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
              .reshape(-1, chunk, *a.shape[1:]) for a in arrs]
    out = jax.lax.map(lambda args: fn(*args), tuple(chunks))
    return jax.tree_util.tree_map(
        lambda l: l.reshape(-1, *l.shape[2:])[:r], out)


def _encode_vbr_lanes(frames, res0, cfg: CodecConfig, c: CodecConsts,
                      cost_tab):
    """Whole-clip VBR encode over independent lanes (channels and/or clips).

    frames f[L, F, N], res0 int32[L] (or scalar) → (FrameCode [L, F, ...],
    table_id [L, F], used [L, F], res_steps [L, F]) — byte-identical to
    vmapping the serial per-channel scan _encode_channel_vbr over lanes
    (asserted in tests/test_huffman.py), but with the step body written
    BATCHED over lanes so the allocation while_loop runs as ONE Pallas
    kernel per step (_vbr_eval_rows) instead of ~10 XLA fusions per loop
    iteration per step — the reservoir chain is the codec's only serial
    axis, so per-step cost is everything (VERDICT r2 item 1).

    A speculative whole-clip fixed point on the budgets (evaluate all
    frames in parallel at guessed budgets, rebuild the reservoir chain
    from the resulting `used` via an associative clamped-affine scan,
    iterate) was built and measured first: it is byte-exact on
    convergence, but greedy allocation spends what it is given, so `used`
    tracks the budget ~1:1 and a ±1-bit budget change reshuffles the
    Huffman costs by several bits — the iteration converges by exactly
    one frame per sweep (measured), i.e. the serial worst case. The
    reservoir chain is inherently sequential at exact-parity granularity.
    TAC_VBR_SERIAL=1 (trace-time) falls back to the per-frame scan for A/B.
    """
    import os

    lanes, f = frames.shape[0], frames.shape[1]
    res0 = jnp.broadcast_to(jnp.asarray(res0, jnp.int32), (lanes,))
    if os.environ.get("TAC_VBR_SERIAL"):
        return jax.vmap(lambda fr, r0: _encode_channel_vbr(
            fr, r0, cfg, c, cost_tab))(frames, res0)

    lines, allocs, tids, used, res_steps = _vbr_decisions(frames, res0,
                                                          cfg, c)
    lanes_f = lanes * f
    swap = lambda x: x.swapaxes(0, 1)                   # [F, L, ...] → [L, F]
    # phase 3 (parallel): quantize every frame at the scan's allocations
    codes = _map_row_chunks(
        lambda ln, al: jax.vmap(
            lambda l_, a_: quantize_given_alloc(l_, a_, cfg, c))(ln, al),
        (lines, swap(allocs).reshape(lanes_f, -1)), lanes_f)
    codes = jax.tree_util.tree_map(
        lambda x: x.reshape(lanes, f, *x.shape[1:]), codes)
    return codes, swap(tids), swap(used), swap(res_steps)


def _vbr_decisions(frames, res0, cfg: CodecConfig, c: CodecConsts):
    """Phases 1+2 of the lane-batched VBR encode: batched analysis +
    pricing tables, then the serial reservoir chain. frames f[L, F, N],
    res0 int32[L] → (lines f[L*F, H], allocs i32[F, L, B], tid/used/res
    i32[F, L])."""
    lanes, f = frames.shape[0], frames.shape[1]
    rows = frames.reshape(lanes * f, frames.shape[-1])

    # phase 1 (parallel): analysis + budget-independent pricing tables
    lines, smr, bits_huf = _map_row_chunks(
        lambda fr: _vbr_phase1(fr, cfg, c), (rows,), lanes * f)
    to_lf = lambda x: x.reshape(lanes, f, *x.shape[1:]).swapaxes(0, 1)

    # phase 2 (serial): the reservoir chain — the WHOLE chain as one Pallas
    # program on TPU fast paths (grid = frames, reservoir in VMEM scratch,
    # tac/ops/pallas_vbr_scan.py), else a lax.scan whose step is warm start
    # + Pallas water-fill + 7-way select pricing over [L, B].
    allocs, tids, used, res_steps = _reservoir_chain(
        to_lf(smr), to_lf(bits_huf), c.n_lines, res0, c.budget,
        cfg.reservoir_factor * c.budget, cfg)
    return lines, allocs, tids, used, res_steps


def _encode_vbr_lanes_to_words(frames, res0, cfg: CodecConfig,
                               c: CodecConsts, cost_tab):
    """_encode_vbr_lanes fused to packed words: phase 3 quantize, the VBR
    payload-field build, AND the bit pack run inside each row chunk, so
    the FrameCode leaves and [R, 2+2B+2H] field matrices stay chunk-sized
    (same whole-array-pass elimination as _encode_rows_to_words; bytes
    identical — every op is per-row). frames f[L, F, N], res0 int32[L or
    scalar] → (words uint32[L, F, W32], nbits int32[L, F])."""
    import os

    from tac.ops.bitpack import pack_rows

    lanes, f = frames.shape[0], frames.shape[1]
    res0 = jnp.broadcast_to(jnp.asarray(res0, jnp.int32), (lanes,))
    cap = payload_capacity_bits(cfg, c)
    if os.environ.get("TAC_VBR_SERIAL"):
        codes, tids, _, _ = _encode_vbr_lanes(frames, res0, cfg, c, cost_tab)
        vals, wids = payload_fields_vbr(codes, tids, cfg, c)
        return pack_rows(vals, wids, cap)

    lines, allocs, tids, _, _ = _vbr_decisions(frames, res0, cfg, c)
    lanes_f = lanes * f
    swap = lambda x: x.swapaxes(0, 1)                   # [F, L, ...] → [L, F]

    def chunk_words(ln, al, td):
        code = jax.vmap(
            lambda l_, a_: quantize_given_alloc(l_, a_, cfg, c))(ln, al)
        vals, wids = payload_fields_vbr(code, td, cfg, c)
        return pack_rows(vals, wids, cap)

    words, nbits = _map_row_chunks(
        chunk_words,
        (lines, swap(allocs).reshape(lanes_f, -1),
         swap(tids).reshape(lanes_f)), lanes_f)
    return (words.reshape(lanes, f, words.shape[-1]),
            nbits.reshape(lanes, f))


def _reservoir_chain(smr, bits_huf, n_lines, res0, base: int, cap: int,
                     cfg: CodecConfig):
    """The serial bit-reservoir chain (SPEC.md §8), frame-major.

    smr f[F, L, B], bits_huf i32[F, L, B, 7], n_lines i32[B] (flat VBR) or
    i32[F, L, B] (the combo's per-frame state-selected maps), res0 i32[L],
    base/cap python ints → (alloc i32[F, L, B], tid/used/res i32[F, L]).

    TPU fast paths run the whole chain as ONE Pallas program — grid over
    frames with the reservoir fill in VMEM scratch (pallas_vbr_scan.py) —
    eliminating the per-step XLA warm start + kernel launch that capped
    VBR encode at ~134 audio-sec/s (PERF.md; VERDICT r2 item 1). Other
    backends / parity precision keep the lax.scan. Decisions are identical
    (tests/test_pallas_vbr_scan.py asserts alloc/tid/used/res equality).
    TAC_VBR_SCAN_KERNEL=0 (trace-time) forces the lax.scan for A/B.
    """
    import os

    use_kernel = _use_pallas_alloc(cfg) \
        and os.environ.get("TAC_VBR_SCAN_KERNEL") != "0"
    if use_kernel:
        from tac.ops.pallas_vbr_scan import vbr_reservoir_scan

        smr_eff = jnp.zeros_like(smr) if cfg.alloc_mode == "uniform" else smr
        return vbr_reservoir_scan(
            ba.snap_smr(smr_eff).astype(jnp.float32), bits_huf, n_lines,
            res0, base=int(base), cap=int(cap),
            max_mant=min(cfg.max_mant_bits, ba.MANT_MAX),
            nb=int(smr.shape[-1]))

    base_t = jnp.asarray(base, jnp.int32)
    cap_t = jnp.asarray(cap, jnp.int32)
    per_frame_nl = n_lines.ndim == 3

    def step(res, xs):
        sm, bh, nl = xs                            # [L, B], [L, B, 7S], [L?, B]
        alloc = _alloc_rows(sm, base_t + res, cfg, nl)
        raw, hufs = _vbr_price(alloc, bh, nl)
        # 3-way (or 2-way) min with tie order raw <= set1 <= set2: argmin
        # takes the FIRST minimum, and raw wins non-strict ties (SPEC §8)
        best_h = jnp.min(hufs, axis=-1)
        tid_h = jnp.argmin(hufs, axis=-1).astype(jnp.int32) + 1
        tid = jnp.where(best_h < raw, tid_h, 0)
        used = jnp.minimum(raw, best_h).astype(jnp.int32)
        res2 = jnp.clip(res + base_t - used, 0, cap_t)
        return res2, (alloc, tid, used, res2)

    nl_xs = n_lines if per_frame_nl else \
        jnp.broadcast_to(n_lines, (smr.shape[0], *n_lines.shape))
    _, out = jax.lax.scan(step, res0, (smr, bits_huf, nl_xs))
    return out


def _vbr_phase1(frame_rows, cfg: CodecConfig, c: CodecConsts):
    """[M, N] frame rows → (lines [M, H], smr [M, B], bits_huf [M, B, 7])."""
    lines, smr = jax.vmap(lambda r_: analyze_frame(r_, cfg, c))(frame_rows)
    return lines, smr, _vbr_band_costs(lines, cfg, c)


@partial(jax.jit, static_argnums=(1,))
def _encode_clip_vbr_impl(x, cfg: CodecConfig) -> VbrCode:
    from tac import huffman as hf

    c = make_consts(cfg)
    cost_tab = cost_tables(cfg)
    frames = fb.frame_signal(x.astype(c.dtype), cfg.n_mdct_lines)  # [C, F, N]
    codes, tids, used, _ = _encode_vbr_lanes(frames, 0, cfg, c, cost_tab)
    return VbrCode(code=codes, table_id=tids, used_bits=used)


def encode_clip_vbr(x, cfg: CodecConfig) -> VbrCode:
    """x: [C, T] → VbrCode; the use_huffman entry point (jitted per shape)."""
    return _encode_clip_vbr_impl(x, cfg)


@partial(jax.jit, static_argnums=(1,))
def _encode_vbr_packed_leading(x, cfg: CodecConfig):
    """VBR encode + huffman field pack entirely on device: reservoir scan,
    raw-vs-huffman pricing, codeword emission (table gathers) and bit pack
    in one fused graph — only payload words cross the device→host link
    (mirrors _encode_packed_leading for the fixed-rate path).

    x: [..., C, T] → (words [..., C, F, W32], nbits [..., C, F]). All
    leading axes flatten into reservoir-scan lanes (each lane = one
    channel's independent chain — or one M/S PAIR's joint chain in ms
    mode, SPEC.md §11), so corpus batches ride the same lane-batched scan
    as a single clip — byte-identical per clip to solo encodes because
    every chain starts at reservoir fill 0."""
    from tac import huffman as hf

    c = make_consts(cfg)
    cost_tab = cost_tables(cfg)
    xt = x.astype(c.dtype)
    if cfg.stereo_mode == "ms":
        xt = ms_forward(xt)
    frames = fb.frame_signal(xt, cfg.n_mdct_lines)
    lead, f = frames.shape[:-2], frames.shape[-2]     # [..., C], F
    if cfg.stereo_mode == "ms":
        pf = frames.reshape(-1, 2, f, frames.shape[-1])  # [P, 2, F, N]
        words, nbits, _ = _encode_vbr_ms_to_words(pf, cfg, c)
        return (words.reshape(*lead, f, words.shape[-1]),
                nbits.reshape(*lead, f))
    words, nbits = _encode_vbr_lanes_to_words(
        frames.reshape(-1, f, frames.shape[-1]), 0, cfg, c, cost_tab)
    return (words.reshape(*lead, f, words.shape[-1]),
            nbits.reshape(*lead, f))


def _encode_vbr_ms_to_words(frames, cfg: CodecConfig, c: CodecConsts,
                            res0=None):
    """M/S joint-reservoir VBR encode (SPEC.md §11 × §8), packed.

    frames f[P, 2, F, N] (P stereo pairs, already M/S-transformed) →
    (words u32[P, 2, F, W32], nbits i32[P, 2, F], res_steps i32[P, F]).
    One reservoir LANE per pair: the scan allocates over the pair's
    concatenated 2B bands with base = 2·budget,
    cap = reservoir_factor · 2·budget, and the raw-vs-huffman choice is
    made JOINTLY (one tableId per pair, written into both channels'
    payloads — the pricing sum over 2B bands IS the pair sum). Phase 1/3
    and the per-channel payload layout are the flat VBR path's,
    unchanged. res0 i32[P] resumes carried joint reservoir fills (the
    streaming core); None = fresh chains (offline clips/corpus)."""
    from tac.ops.bitpack import pack_rows

    p, _, f, n = frames.shape
    nb = c.n_lines.shape[0]
    cap_bits = payload_capacity_bits(cfg, c)
    # frame-major pair-adjacent rows: row (pr, fr, ch)
    rows = frames.swapaxes(1, 2).reshape(p * f * 2, n)

    lines, smr, bits_huf = _map_row_chunks(
        lambda fr_: _vbr_phase1(fr_, cfg, c), (rows,), p * f * 2)
    # pair-join the band axis: [P*F, 2, B] → [P, F, 2B]
    smr2 = smr.reshape(p, f, 2 * nb)
    bh2 = bits_huf.reshape(p, f, 2 * nb, bits_huf.shape[-1])
    nl2 = jnp.concatenate([c.n_lines, c.n_lines])
    to_fl = lambda x_: x_.swapaxes(0, 1)               # [P, F, ...] → [F, P]

    if res0 is None:
        res0 = jnp.zeros((p,), jnp.int32)
    allocs, tids, _, res_steps = _reservoir_chain(
        to_fl(smr2), to_fl(bh2), nl2, jnp.asarray(res0, jnp.int32),
        2 * c.budget, cfg.reservoir_factor * 2 * c.budget, cfg)

    # per-row allocations + the pair's joint tid broadcast to both rows
    al_rows = allocs.swapaxes(0, 1).reshape(p * f * 2, nb)
    tid_rows = jnp.repeat(tids.swapaxes(0, 1).reshape(p * f), 2)

    def chunk_words(ln, al, td):
        code = jax.vmap(
            lambda l_, a_: quantize_given_alloc(l_, a_, cfg, c))(ln, al)
        vals, wids = payload_fields_vbr(code, td, cfg, c)
        return pack_rows(vals, wids, cap_bits)

    words, nbits = _map_row_chunks(
        chunk_words, (lines, al_rows, tid_rows), p * f * 2)
    # rows are [P, F, 2] → [P, 2, F]
    words = words.reshape(p, f, 2, words.shape[-1]).swapaxes(1, 2)
    return (words, nbits.reshape(p, f, 2).swapaxes(1, 2),
            res_steps.swapaxes(0, 1))


def _encode_clip_vbr_packed_impl(x, cfg: CodecConfig):
    return _encode_vbr_packed_leading(x, cfg)


def encode_clip_vbr_packed(x, cfg: CodecConfig):
    """x: [C, T] → (words uint32[C, F, W32], nbits int32[C, F])."""
    return _encode_clip_vbr_packed_impl(x, cfg)


# ------------------------------------------------------- clip-level entry ---

@partial(jax.jit, static_argnums=(1,))
def _encode_clip_impl(x, cfg: CodecConfig):
    c = make_consts(cfg)
    frames = fb.frame_signal(x.astype(c.dtype), cfg.n_mdct_lines)  # [C, F, N]
    ch, f = frames.shape[0], frames.shape[1]
    code = _encode_rows(frames.reshape(ch * f, -1), cfg, c)
    return jax.tree_util.tree_map(
        lambda l: l.reshape(ch, f, *l.shape[1:]), code)


@partial(jax.jit, static_argnums=(1, 2))
def _decode_clip_impl(code: FrameCode, cfg: CodecConfig, t: int):
    c = make_consts(cfg)
    f = jax.vmap(jax.vmap(lambda fc: decode_frame(fc, cfg, c)))
    y = f(code)                                       # [C, F, N]
    return fb.overlap_add(y, cfg.n_mdct_lines, t)     # [C, T]


def encode_clip(x, cfg: CodecConfig) -> FrameCode:
    """x: [C, T] float → FrameCode with [C, F, ...] leaves. Jitted per (cfg,
    shape)."""
    return _encode_clip_impl(x, cfg)


def decode_clip(code: FrameCode, cfg: CodecConfig, t: int):
    """FrameCode [C, F, ...] → [C, T] float (clipped to [-1, 1) by caller)."""
    return _decode_clip_impl(code, cfg, t)
