"""Public API: encode/decode between audio arrays/files and PAC-T bytes.

The reference exposes this surface through PACFile/WAVFile block loops
(SURVEY.md §1 "public interface", §2 #3); here the device pipeline
(tac.codec) produces whole-clip integer arrays in one jit call and this
module does the host-side (de)serialization with the vectorized packer
(tac.bitstream) — no per-block Python loop anywhere.

Layout per payload (SPEC.md §7), realized as a RECTANGULAR field matrix per
(block, channel): [ovs | B alloc codes | B scale factors (width 0 where
alloc=0) | H mantissas (width = band alloc, 0 ⇒ absent) | pad-to-byte].
Zero-width fields occupy no bits, so the variable-length payload packs as a
fixed-shape [K, 2B+H+2] array in one pack_fields call for the entire clip.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tac import bands, bitstream as bs, codec
from tac.codec import FrameCode
from tac.config import CodecConfig
from tac.io.wav import read_wav, write_wav

_B = bands.N_BANDS


# ------------------------------------------------------------- serialize ----

def _field_matrix(code_np: dict, cfg: CodecConfig, h: int, n_lines: np.ndarray):
    """FrameCode numpy arrays [K, ...] → (values, widths) [K, nf] matrices."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    ovs, alloc_code, sf, mant = (code_np["ovs"], code_np["alloc_code"],
                                 code_np["scale"], code_np["mant"])
    k = ovs.shape[0]
    alloc = np.where(alloc_code > 0, alloc_code + 1, 0).astype(np.int64)
    band_of_line = bands.band_of_line(cfg.sample_rate, h)

    vals = np.zeros((k, 2 * _B + h + 2), np.int64)
    wids = np.zeros((k, 2 * _B + h + 2), np.int64)
    vals[:, 0] = ovs;            wids[:, 0] = s
    vals[:, 1:1 + _B] = alloc_code;   wids[:, 1:1 + _B] = a
    vals[:, 1 + _B:1 + 2 * _B] = sf
    wids[:, 1 + _B:1 + 2 * _B] = np.where(alloc > 0, s, 0)
    m_line = alloc[:, band_of_line]                      # [K, H]
    vals[:, 1 + 2 * _B:1 + 2 * _B + h] = mant
    wids[:, 1 + 2 * _B:1 + 2 * _B + h] = m_line
    bits = wids[:, :-1].sum(axis=1)
    wids[:, -1] = (-bits) % 8                            # pad field (value 0)
    return vals, wids, ((bits + wids[:, -1]) // 8).astype(np.int64)


def frames_to_payload(code: FrameCode, cfg: CodecConfig, h: int,
                      n_lines: np.ndarray) -> bytes:
    """FrameCode with [C, F, ...] leaves → interleaved block stream bytes.

    Stream order: block-major, channel-minor (block f: ch0, ch1, ...).
    """
    c, f = code.ovs.shape
    # reorder to [F, C, ...] then flatten → stream order
    code_np = {
        "ovs": np.asarray(code.ovs).transpose(1, 0).reshape(f * c),
        "alloc_code": np.asarray(code.alloc_code).transpose(1, 0, 2).reshape(f * c, -1),
        "scale": np.asarray(code.scale).transpose(1, 0, 2).reshape(f * c, -1),
        "mant": np.asarray(code.mant).transpose(1, 0, 2).reshape(f * c, -1),
    }
    vals, wids, nbytes = _field_matrix(code_np, cfg, h, n_lines)
    payload = bs.pack_fields(vals.ravel(), wids.ravel())
    return bs.assemble_blocks(payload, nbytes)


def payload_to_frames(data: bytes, offset: int, n_blocks: int,
                      cfg: CodecConfig, h: int) -> FrameCode:
    """Inverse of frames_to_payload → FrameCode with [C, F, ...] leaves."""
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    c = cfg.n_channels
    k = n_blocks * c
    offs, _lens = bs.split_blocks(data, offset, k)
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    base = offs * 8                                       # [K] payload bit off
    band_of_line = bands.band_of_line(cfg.sample_rate, h)

    # phase 1: fixed-width head: ovs + B alloc codes
    head_w = np.concatenate([[s], np.full(_B, a)]).astype(np.int64)
    head_off = base[:, None] + np.concatenate([[0], s + a * np.arange(_B)])
    head = bs.unpack_at(bits, head_off.ravel(), np.tile(head_w, k)
                        ).reshape(k, 1 + _B)
    ovs, alloc_code = head[:, 0], head[:, 1:]
    alloc = np.where(alloc_code > 0, alloc_code + 1, 0)

    # phase 2: scale factors (width 0 where alloc == 0)
    sf_w = np.where(alloc > 0, s, 0).astype(np.int64)
    sf_end = np.cumsum(sf_w, axis=1)
    sf_off = base[:, None] + (s + a * _B) + (sf_end - sf_w)
    sf = bs.unpack_at(bits, sf_off.ravel(), sf_w.ravel()).reshape(k, _B)

    # phase 3: mantissas (width = band alloc)
    m_line = alloc[:, band_of_line].astype(np.int64)      # [K, H]
    m_end = np.cumsum(m_line, axis=1)
    m_off = base[:, None] + (s + a * _B) + sf_end[:, -1:] + (m_end - m_line)
    mant = bs.unpack_at(bits, m_off.ravel(), m_line.ravel()).reshape(k, h)

    def to_cf(x):  # [K=F*C, ...] → [C, F, ...]
        return jnp.asarray(np.ascontiguousarray(
            x.reshape(n_blocks, c, *x.shape[1:]).swapaxes(0, 1)).astype(np.int32))

    return FrameCode(ovs=to_cf(ovs), alloc_code=to_cf(alloc_code),
                     scale=to_cf(sf), mant=to_cf(mant))


# ------------------------------------------------------- vbr serialization --

def frames_to_payload_vbr(vbr, cfg: CodecConfig, h: int,
                          n_lines: np.ndarray) -> bytes:
    """VbrCode [C, F, ...] → interleaved block stream (SPEC.md §7 huffman
    layout: ovs | 2-bit tableId | allocs | sfs | coded mantissas | pad)."""
    from tac import huffman as hf

    code, tids = vbr.code, np.asarray(vbr.table_id)
    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    c, f = code.ovs.shape
    k = f * c
    to_k = lambda x: np.asarray(x).swapaxes(0, 1).reshape(k, *x.shape[2:])
    ovs, alloc_code = to_k(code.ovs), to_k(code.alloc_code)
    sf, mant = to_k(code.scale), to_k(code.mant)
    tid = tids.swapaxes(0, 1).reshape(k)
    alloc = np.where(alloc_code > 0, alloc_code + 1, 0).astype(np.int64)
    band_of_line = bands.band_of_line(cfg.sample_rate, h)
    m_line = alloc[:, band_of_line]                       # [K, H]

    # huffman field pairs for every line (per the row's table set);
    # raw rows overwrite below
    hvals, hwids = hf.encode_fields(mant, m_line)         # [K, H, 2]
    for sid in range(2, hf.n_sets() + 1):
        rows = tid == sid
        if rows.any():
            hv_s, hw_s = hf.encode_fields(mant[rows], m_line[rows],
                                          set_id=sid)
            hvals[rows], hwids[rows] = hv_s, hw_s
    raw_rows = tid == 0
    hvals[raw_rows, :, 0] = mant[raw_rows]
    hwids[raw_rows, :, 0] = m_line[raw_rows]
    hvals[raw_rows, :, 1] = 0
    hwids[raw_rows, :, 1] = 0

    nf = 2 + 2 * _B + 2 * h + 1
    vals = np.zeros((k, nf), np.int64)
    wids = np.zeros((k, nf), np.int64)
    vals[:, 0] = ovs;                 wids[:, 0] = s
    vals[:, 1] = tid;                 wids[:, 1] = 2
    vals[:, 2:2 + _B] = alloc_code;   wids[:, 2:2 + _B] = a
    vals[:, 2 + _B:2 + 2 * _B] = sf
    wids[:, 2 + _B:2 + 2 * _B] = np.where(alloc > 0, s, 0)
    vals[:, 2 + 2 * _B:2 + 2 * _B + 2 * h] = hvals.reshape(k, 2 * h)
    wids[:, 2 + 2 * _B:2 + 2 * _B + 2 * h] = hwids.reshape(k, 2 * h)
    bits = wids[:, :-1].sum(axis=1)
    wids[:, -1] = (-bits) % 8
    payload = bs.pack_fields(vals.ravel(), wids.ravel())
    return bs.assemble_blocks(payload, (bits + wids[:, -1]) // 8)


def payload_to_frames_vbr(data: bytes, offset: int, n_blocks: int,
                          cfg: CodecConfig, h: int) -> FrameCode:
    """Inverse of frames_to_payload_vbr (decode side, SPEC.md §8)."""
    from tac import huffman as hf

    s, a = cfg.n_scale_bits, cfg.n_mant_size_bits
    c = cfg.n_channels
    k = n_blocks * c
    offs, _lens = bs.split_blocks(data, offset, k)
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    base = offs * 8
    band_of_line = bands.band_of_line(cfg.sample_rate, h)

    head_w = np.concatenate([[s, 2], np.full(_B, a)]).astype(np.int64)
    head_off = base[:, None] + np.concatenate(
        [[0, s], s + 2 + a * np.arange(_B)])
    head = bs.unpack_at(bits, head_off.ravel(),
                        np.tile(head_w, k)).reshape(k, 2 + _B)
    ovs, tid, alloc_code = head[:, 0], head[:, 1], head[:, 2:]
    alloc = np.where(alloc_code > 0, alloc_code + 1, 0)

    sf_w = np.where(alloc > 0, s, 0).astype(np.int64)
    sf_end = np.cumsum(sf_w, axis=1)
    sf_off = base[:, None] + (s + 2 + a * _B) + (sf_end - sf_w)
    sf = bs.unpack_at(bits, sf_off.ravel(), sf_w.ravel()).reshape(k, _B)

    m_line = alloc[:, band_of_line].astype(np.int64)
    mant = np.zeros((k, h), np.int64)
    mant_start = base + (s + 2 + a * _B) + sf_end[:, -1]
    raw_rows = np.nonzero(tid == 0)[0]
    if raw_rows.size:
        me = np.cumsum(m_line[raw_rows], axis=1)
        mo = mant_start[raw_rows, None] + (me - m_line[raw_rows])
        mant[raw_rows] = bs.unpack_at(
            bits, mo.ravel(), m_line[raw_rows].ravel()).reshape(-1, h)
    if np.any(tid >= 1):
        from tac import native
        raw = np.frombuffer(data, np.uint8)
        for sid in range(1, hf.n_sets() + 1):
            for i in np.nonzero(tid == sid)[0]:
                mant[i], _ = native.huffman_decode_lines(
                    raw, int(mant_start[i]), m_line[i], set_id=sid)

    def to_cf(x):
        return jnp.asarray(np.ascontiguousarray(
            x.reshape(n_blocks, c, *x.shape[1:]).swapaxes(0, 1)
        ).astype(np.int32))

    return FrameCode(ovs=to_cf(ovs), alloc_code=to_cf(alloc_code),
                     scale=to_cf(sf), mant=to_cf(mant))


# ------------------------------------------------------------ public api ----

def encode_array(x: np.ndarray, cfg: CodecConfig) -> bytes:
    """x: float[T] or [T, C] in [-1, 1) → PAC-T bytes.

    Set env TAC_DEBUG_NANS=1 to run the device pipeline under
    jax_debug_nans (SURVEY.md §5.2) — NaNs in any kernel raise immediately
    instead of silently corrupting the stream.
    """
    import os
    if os.environ.get("TAC_DEBUG_NANS"):
        import jax
        jax.config.update("jax_debug_nans", True)
    x = np.asarray(x, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    t, c = x.shape
    if c > 64:
        # a [C, T] array passed where [T, C] is expected silently becomes a
        # T-channel encode (observed: a 2x132300 transpose -> 132300
        # "channels" -> runaway memory). PAC-T caps channels well under 64.
        raise ValueError(
            f"encode_array expects float[T] or [T, C] (got {x.shape}: "
            f"{c} channels) — transpose [C, T] input")
    if c != cfg.n_channels:
        if cfg.stereo_mode == "ms" and c % 2:
            raise ValueError(
                f"stereo_mode='ms' requires even channel count, got {c}")
        cfg = cfg.replace(n_channels=c)
    h = cfg.n_mdct_lines
    n_lines = bands.lines_per_band(cfg.sample_rate, h)
    from tac.ops import bitpack as dbp
    if cfg.use_block_switch:
        from tac import blockswitch as bsw
        enc = (bsw.encode_clip_bs_vbr_packed if cfg.use_huffman
               else bsw.encode_clip_bs_packed)
    elif cfg.use_huffman:
        enc = codec.encode_clip_vbr_packed
    else:
        # bit-pack on device; only payload words cross the host link
        enc = codec.encode_clip_packed
    try:
        words, nbits = enc(x.T, cfg)
        payload = dbp.rows_to_stream(np.asarray(words).swapaxes(0, 1),
                                     np.asarray(nbits).swapaxes(0, 1))
    except Exception:
        # backend worker fault with the auto-tuned fast row chunk: the PJRT
        # client is unrecoverable in-process — downgrade the persisted
        # chunk so the retrying process runs the safe size (tac/tuning.py)
        from tac import tuning
        tuning.record_fault()
        raise
    hdr = bs.PacHeader(
        sample_rate=cfg.sample_rate, n_channels=c, num_samples=t,
        bitrate_bps=cfg.bitrate_bps, n_mdct_lines=h,
        n_mdct_lines_short=cfg.n_mdct_lines_short if cfg.use_block_switch else 0,
        n_scale_bits=cfg.n_scale_bits, n_mant_size_bits=cfg.n_mant_size_bits,
        n_lines_long=n_lines,
        n_lines_short=(bands.lines_per_band(cfg.sample_rate,
                                            cfg.n_mdct_lines_short)
                       if cfg.use_block_switch else None),
        huffman=cfg.use_huffman, blockswitch=cfg.use_block_switch,
        ms=cfg.stereo_mode == "ms")
    return bs.write_header(hdr) + payload


def header_config(hdr: bs.PacHeader, precision: str = "fast") -> CodecConfig:
    """The decode-side CodecConfig implied by a PAC-T header."""
    return CodecConfig(
        sample_rate=hdr.sample_rate, n_channels=hdr.n_channels,
        bitrate_bps=hdr.bitrate_bps, n_mdct_lines=hdr.n_mdct_lines,
        n_scale_bits=hdr.n_scale_bits, n_mant_size_bits=hdr.n_mant_size_bits,
        use_huffman=hdr.huffman, use_block_switch=hdr.blockswitch,
        n_mdct_lines_short=max(hdr.n_mdct_lines_short, 1),
        stereo_mode="ms" if hdr.ms else "lr",
        use_psy=False, precision=precision)


def decode_array(data: bytes, precision: str = "parity"
                 ) -> tuple[np.ndarray, int]:
    """PAC-T bytes → (float32[T, C], sample_rate)."""
    hdr, off = bs.read_header(data)
    cfg = header_config(hdr, precision)
    h = hdr.n_mdct_lines
    from tac.dsp.mdct import num_frames
    f = num_frames(hdr.num_samples, h)
    # every stream family unpacks ON DEVICE: upload only the payload words
    # (~the bitstream itself) and decode end-to-end in one fused graph
    from tac.ops import bitpack as dbp
    c = cfg.n_channels
    offs, lens = bs.split_blocks(data, off, f * c)
    if hdr.blockswitch:
        from tac import blockswitch as bsw
        # capacity is pure host arithmetic: building BsConsts here would
        # upload the basis matrices on every decode (measured 5x slowdown)
        cap = (bsw.capacity_bits_bs_vbr(cfg) if hdr.huffman
               else bsw.capacity_bits_bs(cfg))
        w32 = -(-cap // 32)
        rows = dbp.stream_to_rows(data, offs, lens, w32)
        words = jnp.asarray(np.ascontiguousarray(
            rows.reshape(f, c, w32).swapaxes(0, 1)))       # [C, F, W32]
        dec = (bsw.decode_clip_bs_vbr_packed if hdr.huffman
               else bsw.decode_clip_bs_packed)
        x = dec(words, cfg, hdr.num_samples)
    else:
        w32 = -(-codec.payload_capacity_bits(cfg) // 32)
        rows = dbp.stream_to_rows(data, offs, lens, w32)   # [F*C, W32]
        words = jnp.asarray(np.ascontiguousarray(
            rows.reshape(f, c, w32).swapaxes(0, 1)))       # [C, F, W32]
        if hdr.huffman:
            x = codec.decode_clip_vbr_packed(words, cfg, hdr.num_samples)
        else:
            x = codec.decode_clip_packed(words, cfg, hdr.num_samples)
    return np.asarray(x).T.astype(np.float32), hdr.sample_rate


def decode_range(data: bytes, start: int, stop: int,
                 precision: str = "fast") -> tuple[np.ndarray, int]:
    """Sample-accurate random-access decode: PAC-T bytes →
    (float32[stop-start, C], sample_rate) for output samples [start, stop).

    The reference's ReadDataBlock loop is strictly sequential file-at-a-
    time (SURVEY.md §3.2); here any output sample s depends on exactly
    two adjacent frames (s//H and s//H+1 — the 50 % MDCT overlap), and
    every per-frame decision (window state, tableId, scale factors) rides
    in that frame's payload, so decoding just the covering frame subset
    [start//H, (stop-1)//H + 2) reproduces the full decode's samples
    exactly in parity precision (fast precision: within f32 batch-shape
    ULP, the same contract as StreamDecoder). The container's chained u16
    length prefixes still force a host framing walk over the prefixes
    (native C, ~ns per block) — but only the covered frames' payload
    bytes are uploaded and decoded on device.

    Indices clamp to [0, num_samples]; works for every stream family
    (raw / VBR / blockswitch / combo, lr and ms). The covered frame COUNT
    is rounded up to the next power of two (capped at the clip's frame
    count) and the extra real frames decoded and sliced away, so a server
    issuing arbitrary-length seeks compiles at most ~log2(F) device
    programs per stream family instead of one per distinct length
    (tests/test_seek.py::test_seek_compile_count). Worst case this decodes
    2x the needed frames — cheaper than one extra XLA compile by orders of
    magnitude.
    """
    hdr, off = bs.read_header(data)
    cfg = header_config(hdr, precision)
    h = hdr.n_mdct_lines
    from tac.dsp.mdct import num_frames
    f = num_frames(hdr.num_samples, h)
    c = cfg.n_channels
    start = max(0, min(int(start), hdr.num_samples))
    stop = max(start, min(int(stop), hdr.num_samples))
    if stop == start:
        return np.zeros((0, c), np.float32), hdr.sample_rate
    fa, fb = start // h, min(f, (stop - 1) // h + 2)
    # bucket the covered count: round up to a power of two (≤ f) and take
    # the extra frames from real neighbors — backward when hitting EOF
    k = min(1 << (fb - fa - 1).bit_length(), f)
    fb = min(f, fa + k)
    fa = fb - k
    offs, lens = bs.split_blocks(data, off, f * c)
    offs = np.asarray(offs)[fa * c: fb * c]
    lens = np.asarray(lens)[fa * c: fb * c]
    from tac.ops import bitpack as dbp
    t_local = (k - 1) * h
    if hdr.blockswitch:
        from tac import blockswitch as bsw
        cap = (bsw.capacity_bits_bs_vbr(cfg) if hdr.huffman
               else bsw.capacity_bits_bs(cfg))
        w32 = -(-cap // 32)
        rows = dbp.stream_to_rows(data, offs, lens, w32)
        words = jnp.asarray(np.ascontiguousarray(
            rows.reshape(k, c, w32).swapaxes(0, 1)))
        dec = (bsw.decode_clip_bs_vbr_packed if hdr.huffman
               else bsw.decode_clip_bs_packed)
        x = dec(words, cfg, t_local)
    else:
        w32 = -(-codec.payload_capacity_bits(cfg) // 32)
        rows = dbp.stream_to_rows(data, offs, lens, w32)
        words = jnp.asarray(np.ascontiguousarray(
            rows.reshape(k, c, w32).swapaxes(0, 1)))
        dec = (codec.decode_clip_vbr_packed if hdr.huffman
               else codec.decode_clip_packed)
        x = dec(words, cfg, t_local)
    out = np.asarray(x).T.astype(np.float32)
    return out[start - fa * h: stop - fa * h], hdr.sample_rate


def encode(wav_path: str, pac_path: str, cfg: CodecConfig) -> dict:
    """WAV file → PAC-T file. Returns a stats record (SURVEY.md §5.5)."""
    x, fs = read_wav(wav_path)
    if fs != cfg.sample_rate:
        cfg = cfg.replace(sample_rate=fs)
    data = encode_array(x, cfg)
    with open(pac_path, "wb") as fo:
        fo.write(data)
    dur = x.shape[0] / fs
    return {"seconds": dur, "bytes": len(data),
            "kbps": len(data) * 8 / dur / 1000.0}


def decode(pac_path: str, wav_path: str, precision: str = "parity") -> dict:
    with open(pac_path, "rb") as fi:
        data = fi.read()
    x, fs = decode_array(data, precision)
    write_wav(wav_path, x, fs)
    return {"seconds": x.shape[0] / fs, "sample_rate": fs,
            "channels": x.shape[1]}
