"""Streaming (chunked) encode/decode with explicit, serializable state.

The reference is file-at-a-time only; its implicit carried state is the
`priorBlock` buffer (SURVEY.md §3.1). Here that state is an explicit pytree
(SURVEY.md §5.4): `(prior half-block, lookahead half-block, VBR reservoir,
emitted-block count)` — small, serializable, and sufficient to resume an
encode mid-stream bit-exactly.

Latency: frames are emitted one half-block (H samples) behind the input so
the block-switch transient detector sees the half-block ENTERING the next
frame (SPEC.md §9 lookahead). Total algorithmic delay = 2*H/fs
(11.6 ms at H = 256, fs = 44.1 kHz — BASELINE config 5's < 20 ms).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from tac import bands
from tac.config import CodecConfig


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
    """

    def __init__(self, cfg: CodecConfig, n_channels: Optional[int] = None):
        c = n_channels or cfg.n_channels
        self.cfg = cfg.replace(n_channels=c)
        h = cfg.n_mdct_lines
        self.state = StreamState(
            prior=np.zeros((c, h)), look=np.zeros((c, h)),
            pending=np.zeros((c, 0)), reservoir=np.zeros(c, np.int64),
            t_hist=np.zeros((c, 2), bool))

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
            huffman=cfg.use_huffman, blockswitch=cfg.use_block_switch))

    def push(self, x: np.ndarray) -> bytes:
        """x: float[T'] or [T', C] new samples → emitted payload bytes."""
        x = np.asarray(x, np.float64)
        if x.ndim == 1:
            x = x[:, None]
        st = self.state
        h = self.cfg.n_mdct_lines
        buf = np.concatenate([st.pending, x.T], axis=1)
        out = []
        while buf.shape[1] >= h:
            half, buf = buf[:, :h], buf[:, h:]
            out.append(self._advance(half))
        st.pending = buf
        return b"".join(out)

    def flush(self) -> bytes:
        """Emit remaining frames (zero-pad tail + final flush block)."""
        st = self.state
        h = self.cfg.n_mdct_lines
        out = []
        if st.pending.shape[1] > 0:
            pad = np.zeros((st.pending.shape[0], h - st.pending.shape[1]))
            out.append(self._advance(np.concatenate([st.pending, pad], 1)))
            st.pending = st.pending[:, :0]
        out.append(self._advance(np.zeros_like(st.prior)))   # flush tail
        if self.cfg.use_block_switch:
            # the lookahead delay line holds one more emitted frame
            out.append(self._advance(np.zeros_like(st.prior)))
        return b"".join(out)

    # ------------------------------------------------------------ internal --

    def _advance(self, half: np.ndarray) -> bytes:
        """Feed one half-block per channel; emit the due frame's payloads."""
        st = self.state
        cfg = self.cfg
        if cfg.use_block_switch:
            if not st.primed:        # buffer the first half-block (lookahead)
                st.look = half
                st.primed = True
                return b""
            emit_new, st.look = st.look, half
        else:
            emit_new = half
        payload = self._encode_block(emit_new, st.look
                                     if cfg.use_block_switch else None)
        st.prior = emit_new.copy()
        st.blocks_out += 1
        return payload

    def _encode_block(self, new: np.ndarray,
                      look: Optional[np.ndarray]) -> bytes:
        """One frame = [prior | new] per channel; `look` drives transient
        detection for the block-switch state decision."""
        from tac.oracle import blockswitch as obs
        from tac.oracle.bitpack import PackedBits
        from tac.oracle.codec import EncodeSingleChannel, mantissa_budget
        from tac.oracle.pacfile import (_mantissa_costs, _write_payload)

        st = self.state
        cfg = self.cfg
        out = []
        for ch in range(new.shape[0]):
            full = np.concatenate([st.prior[ch], new[ch]])
            if cfg.use_block_switch:
                # SPEC §9 neighbor logic from the rolling 4-flag window:
                # t[i-2], t[i-1] (history), t[i] (new), t[i+1] (lookahead)
                t_m2, t_m1 = bool(st.t_hist[ch, 0]), bool(st.t_hist[ch, 1])
                t_0 = bool(obs.transient_flags(new[ch], cfg)[0])
                t_p1 = bool(obs.transient_flags(look[ch], cfg)[0])
                want_prev = t_m2 or t_m1
                want = t_m1 or t_0
                want_next = t_0 or t_p1
                if want or (want_prev and want_next):
                    state = obs.SHORT
                elif want_next:
                    state = obs.START
                elif want_prev:
                    state = obs.STOP
                else:
                    state = obs.LONG
                st.t_hist[ch] = (t_m1, t_0)
                pb = PackedBits()
                obs.encode_block_bs(full, state, cfg, pb)
                payload = pb.GetPackedData()
            elif cfg.use_huffman:
                base = mantissa_budget(cfg, cfg.n_mdct_lines)
                cap = cfg.reservoir_factor * base
                budget = base + int(st.reservoir[ch])
                enc = EncodeSingleChannel(full, cfg, budget)
                raw, huf = _mantissa_costs(enc[1], enc[3], cfg)
                tid = 1 if huf < raw else 0
                used = min(raw, huf)
                st.reservoir[ch] = min(max(int(st.reservoir[ch])
                                           + base - used, 0), cap)
                payload = _write_payload(*enc, cfg, table_id=tid)
            else:
                payload = _write_payload(*EncodeSingleChannel(full, cfg),
                                         cfg)
            out.append(len(payload).to_bytes(2, "little"))
            out.append(payload)
        return b"".join(out)
