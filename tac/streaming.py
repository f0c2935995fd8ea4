"""Streaming (chunked) encode with explicit, serializable state — TPU-native.

The reference is file-at-a-time only; its implicit carried state is the
`priorBlock` buffer (SURVEY.md §3.1). Here that state is an explicit record
(SURVEY.md §5.4): `(prior half-block, lookahead half-block, pending samples,
VBR reservoir, transient-flag history)` — small, serializable, and
sufficient to resume an encode mid-stream bit-exactly.

TPU-native design: every `push` encodes ALL newly-completed frames in one
batched jitted call through the SAME cores as the offline clip path
(`codec._encode_frames_packed_halves` / `codec._encode_frames_vbr_packed` /
`blockswitch._encode_frames_bs_packed`), so the emitted bytes equal the
offline `tac.api.encode_array` bytes by construction — there is no separate
streaming codepath to drift. Frame counts are padded to power-of-two
buckets so the number of compiled shapes stays logarithmic in push size.

Latency: in block-switch mode frames are emitted one half-block (H samples)
behind the input so the transient detector sees the half-block ENTERING the
next frame (SPEC.md §9 lookahead). Total algorithmic delay = 2*H/fs
(11.6 ms at H = 256, fs = 44.1 kHz — BASELINE config 5's < 20 ms).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from tac import bands
from tac.config import CodecConfig


def _bucket(m: int, lo: int = 8) -> int:
    """Smallest power-of-two >= m (>= lo): bounds jit recompiles per shape."""
    b = lo
    while b < m:
        b *= 2
    return b


@dataclasses.dataclass
class StreamState:
    """Everything the encoder carries between chunks (per channel arrays)."""
    prior: np.ndarray        # [C, H] previous half-block (overlap state)
    look: np.ndarray         # [C, H] lookahead half-block not yet emitted
    pending: np.ndarray      # [C, <H] residual samples not yet a half-block
    reservoir: np.ndarray    # [C] int64 VBR bit reservoir
    t_hist: np.ndarray = None  # [C, 2] bool: transient flags t[i-2], t[i-1]
    blocks_out: int = 0
    primed: bool = False     # lookahead buffer filled?

    def to_bytes(self) -> bytes:
        """Serialize for checkpoint/resume (SURVEY.md §5.4)."""
        import io
        import json

        bio = io.BytesIO()
        meta = {"blocks_out": self.blocks_out, "primed": self.primed,
                "pending_len": self.pending.shape[1]}
        head = json.dumps(meta).encode()
        bio.write(len(head).to_bytes(4, "little"))
        bio.write(head)
        for a in (self.prior, self.look, self.pending, self.reservoir,
                  self.t_hist):
            np.save(bio, np.ascontiguousarray(a))
        return bio.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "StreamState":
        import io
        import json

        bio = io.BytesIO(data)
        n = int.from_bytes(bio.read(4), "little")
        meta = json.loads(bio.read(n))
        prior, look, pending, reservoir, t_hist = (np.load(bio)
                                                   for _ in range(5))
        return cls(prior=prior, look=look, pending=pending,
                   reservoir=reservoir, t_hist=t_hist,
                   blocks_out=meta["blocks_out"], primed=meta["primed"])


class StreamEncoder:
    """Push samples in, get PAC-T block payload bytes out.

    The emitted byte stream concatenated after `header()` equals the
    corresponding offline `tac.api.encode_array` stream for the same total
    signal (same per-block payloads; verified in tests/test_streaming.py).

    Bit-exactness vs offline holds for ANY push chunking in "parity"
    precision (the f64 FFT analysis is batch-shape-stable). In "fast"
    precision XLA may pick different f32 kernel schedules for different
    batch shapes, so a push pattern whose frame batches differ from the
    offline encode's can flip occasional 1/16-dB-grid allocation
    decisions — byte-identical per-frame analysis is only guaranteed for
    matching shapes; rate and quality are unaffected (a few +-1-bit
    band allocations; tests/test_streaming.py pins both contracts).
    """

    def __init__(self, cfg: CodecConfig, n_channels: Optional[int] = None):
        c = n_channels or cfg.n_channels
        self.cfg = cfg.replace(n_channels=c)
        h = cfg.n_mdct_lines
        # ms mode: ONE joint reservoir + ONE shared transient history per
        # channel PAIR (SPEC.md §11), kept as length-P leading axes;
        # buffers stay in the L/R domain — the butterfly runs on device
        # inside the ms cores (commutes with framing)
        n_ms = c // 2 if cfg.stereo_mode == "ms" else c
        self.state = StreamState(
            prior=np.zeros((c, h)), look=np.zeros((c, h)),
            pending=np.zeros((c, 0)), reservoir=np.zeros(n_ms, np.int64),
            t_hist=np.zeros((n_ms, 2), bool))

    def header(self, num_samples: int = 0) -> bytes:
        from tac import bitstream as bs

        cfg = self.cfg
        return bs.write_header(bs.PacHeader(
            sample_rate=cfg.sample_rate, n_channels=cfg.n_channels,
            num_samples=num_samples, bitrate_bps=cfg.bitrate_bps,
            n_mdct_lines=cfg.n_mdct_lines,
            n_mdct_lines_short=cfg.n_mdct_lines_short
            if cfg.use_block_switch else 0,
            n_scale_bits=cfg.n_scale_bits,
            n_mant_size_bits=cfg.n_mant_size_bits,
            n_lines_long=bands.lines_per_band(cfg.sample_rate,
                                              cfg.n_mdct_lines),
            n_lines_short=(bands.lines_per_band(
                cfg.sample_rate, cfg.n_mdct_lines_short)
                if cfg.use_block_switch else None),
            huffman=cfg.use_huffman, blockswitch=cfg.use_block_switch,
            ms=cfg.stereo_mode == "ms"))

    def push(self, x: np.ndarray) -> bytes:
        """x: float[T'] or [T', C] new samples → emitted payload bytes."""
        x = np.asarray(x, np.float64)
        if x.ndim == 1:
            x = x[:, None]
        st = self.state
        h = self.cfg.n_mdct_lines
        buf = np.concatenate([st.pending, x.T], axis=1)
        c, total = buf.shape
        m = total // h
        st.pending = buf[:, m * h:]
        if m == 0:
            return b""
        halves = np.ascontiguousarray(buf[:, : m * h].reshape(c, m, h))
        return self._emit(halves)

    def flush(self) -> bytes:
        """Emit remaining frames (zero-pad tail + final flush block)."""
        st = self.state
        c, p = st.pending.shape
        h = self.cfg.n_mdct_lines
        tail = []
        if p > 0:
            tail.append(np.concatenate(
                [st.pending, np.zeros((c, h - p))], axis=1)[:, None, :])
            st.pending = st.pending[:, :0]
        tail.append(np.zeros((c, 1, h)))                 # flush half h_Kb
        if self.cfg.use_block_switch:
            tail.append(np.zeros((c, 1, h)))             # lookahead drain
        return self._emit(np.concatenate(tail, axis=1))

    # ------------------------------------------------------------ internal --

    def _emit(self, halves: np.ndarray) -> bytes:
        """halves: [C, m, H] newly-completed half-blocks → payload bytes for
        every frame they make emittable, in one batched jitted call."""
        if self.cfg.use_block_switch:
            return self._emit_bs(halves)
        return self._emit_flat(halves)

    def _emit_flat(self, halves: np.ndarray) -> bytes:
        """Raw / VBR modes: each half h_j completes frame j = [h_{j-1}|h_j].

        One device call per push: upload = the new halves (frames form
        on device), pull = the packed payload words — both ~the size of
        the audio/bitstream itself. VBR packs its fields on device too
        (same pack as offline; the round-2 host-pack path pulled whole
        FrameCode integer arrays per push, ~20x the payload)."""
        import jax.numpy as jnp

        from tac import codec
        from tac.ops import bitpack as dbp

        st, cfg = self.state, self.cfg
        c, m, h = halves.shape
        mb = _bucket(m)
        dt = np.float64 if cfg.precision == "parity" else np.float32
        hp = jnp.asarray(np.pad(halves, ((0, 0), (0, mb - m), (0, 0)))
                         .astype(dt))          # upload in compute dtype
        prior = jnp.asarray(st.prior.astype(dt))
        st.prior = halves[:, -1].copy()
        st.blocks_out += m
        if cfg.stereo_mode == "ms":
            if cfg.use_huffman:
                res0 = jnp.asarray(st.reservoir, jnp.int32)
                words, nbits, res_steps = codec._encode_frames_ms_vbr_packed(
                    prior, hp, res0, cfg)
                st.reservoir = np.asarray(res_steps)[:, m - 1] \
                    .astype(np.int64)
            else:
                words, nbits = codec._encode_frames_ms_packed_halves(
                    prior, hp, cfg)
        elif cfg.use_huffman:
            res0 = jnp.asarray(st.reservoir, jnp.int32)
            words, nbits, res_steps = codec._encode_frames_vbr_packed(
                prior, hp, res0, cfg)
            st.reservoir = np.asarray(res_steps)[:, m - 1].astype(np.int64)
        else:
            words, nbits = codec._encode_frames_packed_halves(prior, hp, cfg)
        return dbp.rows_to_stream(np.asarray(words)[:, :m].swapaxes(0, 1),
                                  np.asarray(nbits)[:, :m].swapaxes(0, 1))

    def _emit_bs(self, halves: np.ndarray) -> bytes:
        import jax.numpy as jnp

        from tac import blockswitch as bsw
        from tac.ops import bitpack as dbp

        st, cfg = self.state, self.cfg
        c, m, h = halves.shape
        if not st.primed:                  # first half becomes the lookahead
            st.look = halves[:, 0].copy()
            st.primed = True
            halves = halves[:, 1:]
            m -= 1
            if m == 0:
                return b""
        mb = _bucket(m)
        dt = np.float64 if cfg.precision == "parity" else np.float32
        hp = jnp.asarray(np.pad(halves, ((0, 0), (0, mb - m), (0, 0)))
                         .astype(dt))
        prior = jnp.asarray(st.prior.astype(dt))
        look = jnp.asarray(st.look.astype(dt))
        if cfg.stereo_mode == "ms":        # joint pair cores (SPEC.md §11×§9)
            if cfg.use_huffman:
                words, nbits, t, res_steps = \
                    bsw._encode_frames_bs_vbr_ms_packed(
                        prior, look, hp, jnp.asarray(st.t_hist),
                        jnp.asarray(st.reservoir, jnp.int32), cfg)
                st.reservoir = np.asarray(res_steps)[:, m - 1] \
                    .astype(np.int64)
            else:
                words, nbits, t = bsw._encode_frames_bs_ms_packed(
                    prior, look, hp, jnp.asarray(st.t_hist), cfg)
        elif cfg.use_huffman:              # combo: reservoir rides the state
            words, nbits, t, res_steps = bsw._encode_frames_bs_vbr_packed(
                prior, look, hp, jnp.asarray(st.t_hist),
                jnp.asarray(st.reservoir, jnp.int32), cfg)
            st.reservoir = np.asarray(res_steps)[:, m - 1].astype(np.int64)
        else:
            words, nbits, t = bsw._encode_frames_bs_packed(
                prior, look, hp, jnp.asarray(st.t_hist), cfg)
        t = np.asarray(t)
        st.t_hist = t[:, m:m + 2].copy()   # (t_{e+m-2}, t_{e+m-1})
        st.prior = (halves[:, -2] if m >= 2 else st.look).copy()
        st.look = halves[:, -1].copy()
        st.blocks_out += m
        return dbp.rows_to_stream(np.asarray(words)[:, :m].swapaxes(0, 1),
                                  np.asarray(nbits)[:, :m].swapaxes(0, 1))


class StreamDecoder:
    """Push PAC-T payload bytes in, get PCM out — the decode mirror of
    StreamEncoder (the reference has no streaming decode at all; its
    ``ReadDataBlock`` loop is file-at-a-time, SURVEY.md §3.2).

    Frames decode through the SAME device cores as the offline packed
    decode (field unpack → dequantize → IMDCT), batched per push with
    power-of-two frame buckets; the overlap-add's one-half-frame coupling
    is the only carried state (``tail``, [C, H]). Algorithmic delay is
    therefore exactly one half-block: frame i's arrival finalizes output
    samples [(i-1)·H, i·H).
    """

    def __init__(self, cfg: CodecConfig, num_samples: int = 0):
        self.cfg = cfg
        self.num_samples = int(num_samples)   # 0 = unknown (emit everything)
        self.buf = b""
        self.tail: Optional[np.ndarray] = None    # [C, H] carried half
        self.frames_in = 0
        self.emitted = 0

    @classmethod
    def from_header(cls, data: bytes, precision: str = "fast"
                    ) -> tuple["StreamDecoder", int]:
        """Parse a PAC-T header → (decoder, payload offset). Feed
        ``data[offset:]`` (and any later bytes) to push()."""
        from tac import api, bitstream as bs

        hdr, off = bs.read_header(data)
        return cls(api.header_config(hdr, precision), hdr.num_samples), off

    # ------------------------------------------------------------ internal --

    def _w32(self) -> int:
        from tac import codec

        cfg = self.cfg
        if cfg.use_block_switch:
            from tac import blockswitch as bsw
            cap = (bsw.capacity_bits_bs_vbr(cfg) if cfg.use_huffman
                   else bsw.capacity_bits_bs(cfg))
        else:
            cap = codec.payload_capacity_bits(cfg)
        return -(-cap // 32)

    # -------------------------------------------------------------- public --

    def push(self, data: bytes) -> np.ndarray:
        """data: next stream bytes (any chunking) → float32[T', C] newly
        finalized samples (empty until a full frame × channels arrives)."""
        import struct

        import jax.numpy as jnp

        from tac.native import CorruptStreamError
        from tac.ops import bitpack as dbp

        self.buf += data
        cfg = self.cfg
        c, h = cfg.n_channels, cfg.n_mdct_lines
        offs, lens, pos = [], [], 0
        while len(self.buf) - pos >= 2:
            (ln,) = struct.unpack_from("<H", self.buf, pos)
            if pos + 2 + ln > len(self.buf):
                break
            offs.append(pos + 2)
            lens.append(ln)
            pos += 2 + ln
        m = len(offs) // c
        if m == 0:
            return np.zeros((0, c), np.float32)
        consumed = offs[m * c - 1] + lens[m * c - 1]
        w32 = self._w32()
        if max(lens[: m * c]) * 8 > w32 * 32:
            raise CorruptStreamError("block length exceeds frame capacity")
        rows = dbp.stream_to_rows(self.buf,
                                  np.asarray(offs[: m * c], np.int64),
                                  np.asarray(lens[: m * c], np.int64), w32)
        self.buf = self.buf[consumed:]
        words = np.ascontiguousarray(
            rows.reshape(m, c, w32).swapaxes(0, 1))       # [C, M, W32]
        mb = _bucket(m)
        wp = jnp.asarray(np.pad(words, ((0, 0), (0, mb - m), (0, 0))))
        priming = self.tail is None           # frame 0 is the priming block
        tail = (np.zeros((c, h), np.float32) if priming else self.tail)
        from tac import codec
        out_d, ntail = codec._decode_frames_stream(
            wp, jnp.asarray(tail), jnp.asarray(m, jnp.int32), cfg)
        self.frames_in += m
        self.tail = np.asarray(ntail)
        out = np.asarray(out_d)[:, :m]                    # [C, m, H]
        if priming:                           # first output row is invalid
            out = out[:, 1:]
            m -= 1
            if m == 0:
                return np.zeros((0, c), np.float32)
        out = out.reshape(c, m * h).T.astype(np.float32)
        if self.num_samples:
            out = out[: max(self.num_samples - self.emitted, 0)]
        self.emitted += out.shape[0]
        return out
