"""Corpus transcoding: batched device encode with manifest-based resume.

The reference's corpus story is a bash loop over files, one process each
(SURVEY.md §3.5). TPU-native replacement (BASELINE config 4):

  * clips are bucketed by padded length (bounded jit recompiles) and
    encoded in device batches (vmapped packed encode; shard over a mesh
    clips axis on multi-chip via tac.parallel);
  * the zero-padding of a bucket coincides with the codec's own flush
    padding, so the per-clip byte streams are IDENTICAL to single-clip
    encodes (asserted in tests) — rows past the clip's true frame count
    are simply dropped;
  * per-clip failure isolation: a failed batch falls back to per-clip
    encodes; a clip failing `retries` times is quarantined, not fatal
    (SURVEY.md §5.3);
  * the manifest (JSONL, one record per clip: status, kbps, seconds,
    encode wall time) makes re-runs idempotent — done clips are skipped
    (SURVEY.md §5.4/§5.5).
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np

from tac import bands, bitstream as bs
from tac.config import CodecConfig
from tac.io.wav import read_wav


def _bucket_len(t: int, h: int) -> int:
    """Pad target: next multiple of 32 half-blocks (bounds recompiles)."""
    step = 32 * h
    return max(-(-t // step) * step, step)


def _header_bytes(cfg: CodecConfig, n_ch: int, t: int) -> bytes:
    return bs.write_header(bs.PacHeader(
        sample_rate=cfg.sample_rate, n_channels=n_ch, num_samples=t,
        bitrate_bps=cfg.bitrate_bps, n_mdct_lines=cfg.n_mdct_lines,
        n_mdct_lines_short=cfg.n_mdct_lines_short
        if cfg.use_block_switch else 0,
        n_scale_bits=cfg.n_scale_bits,
        n_mant_size_bits=cfg.n_mant_size_bits,
        n_lines_long=bands.lines_per_band(cfg.sample_rate,
                                          cfg.n_mdct_lines),
        n_lines_short=(bands.lines_per_band(cfg.sample_rate,
                                            cfg.n_mdct_lines_short)
                       if cfg.use_block_switch else None),
        huffman=cfg.use_huffman, blockswitch=cfg.use_block_switch,
        ms=cfg.stereo_mode == "ms"))


def _load_manifest(path: str) -> dict[str, dict]:
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                    done[rec["clip"]] = rec
                except json.JSONDecodeError:
                    continue
    return done


class CorpusTranscoder:
    """Drives WAV→PAC-T transcoding over a corpus with resume + quarantine."""

    def __init__(self, cfg: CodecConfig, out_dir: str,
                 manifest: Optional[str] = None,
                 batch_size: Optional[int] = None,
                 retries: int = 1, io_threads: int = 4, mesh=None):
        from tac import tuning

        self.cfg = cfg
        self.out_dir = out_dir
        self.manifest_path = manifest or os.path.join(out_dir,
                                                      "manifest.jsonl")
        # None → per-backend default: the measured VBR lane-batch knee
        # (32) on healthy TPU attach, 8 on link-bound/CPU backends
        # (tuning.corpus_batch_default, PERF.md round-4 ladder)
        self.batch_size = batch_size or tuning.corpus_batch_default()
        self.retries = retries
        self.io_threads = io_threads
        self.mesh = mesh          # multi-chip: shard clips over this mesh
        os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------ encode ---

    def _encode_batch(self, clips: list[np.ndarray],
                      cfg: Optional[CodecConfig] = None) -> list[bytes]:
        """clips: list of [T_i, C] float arrays → per-clip payload bytes.

        Pads every clip to the common bucket length; drops rows beyond
        each clip's true frame count (identical bytes to solo encode).
        cfg overrides self.cfg for one group (rate/channel adaptation —
        passed explicitly, never by mutating self).
        """
        import jax

        from tac import parallel
        from tac.dsp.mdct import num_frames
        from tac.ops import bitpack as dbp

        cfg = cfg or self.cfg
        h = cfg.n_mdct_lines
        tb = max(_bucket_len(c.shape[0], h) for c in clips)
        n = len(clips)
        shards = self.mesh.shape["clips"] if self.mesh is not None else 1
        b = -(-n // shards) * shards          # pad batch to shard multiple
        batch = np.zeros((b, clips[0].shape[1], tb), np.float32)
        for i, c in enumerate(clips):
            batch[i, :, : c.shape[0]] = c.T
        if self.mesh is not None:
            words, nbits = parallel.encode_batch_packed_sharded(
                parallel.shard_clips(batch, self.mesh), cfg, self.mesh)
        else:
            words, nbits = parallel.encode_batch_packed(
                jax.device_put(batch), cfg)
        w_np, n_np = np.asarray(words), np.asarray(nbits)
        out = []
        for i, c in enumerate(clips):
            f = num_frames(c.shape[0], h)
            out.append(dbp.rows_to_stream(w_np[i, :, :f].swapaxes(0, 1),
                                          n_np[i, :, :f].swapaxes(0, 1)))
        return out

    def _encode_one(self, x: np.ndarray,
                    cfg: Optional[CodecConfig] = None) -> bytes:
        return self._encode_batch([x], cfg)[0]

    # ------------------------------------------------------------- drive ---

    def run(self, wav_paths: Sequence[str], log=print) -> dict:
        done = _load_manifest(self.manifest_path)
        todo = [p for p in wav_paths
                if done.get(p, {}).get("status") != "ok"]
        log(f"corpus: {len(wav_paths)} clips, {len(wav_paths) - len(todo)} "
            f"already done, {len(todo)} to encode")
        stats = {"ok": len(wav_paths) - len(todo), "failed": 0,
                 "audio_s": 0.0, "wall_s": 0.0}

        mf = open(self.manifest_path, "a")
        pool = ThreadPoolExecutor(self.io_threads)
        try:
            for lo in range(0, len(todo), self.batch_size):
                paths = todo[lo:lo + self.batch_size]
                loaded = list(pool.map(self._safe_read, paths))
                good = [(p, x, fs) for p, (x, fs) in zip(paths, loaded)
                        if x is not None]
                for p, (x, fs) in zip(paths, loaded):
                    if x is None:
                        self._record(mf, stats, p, "read_error")
                # group by (channels, rate) so one batch = one jit shape set
                groups: dict = {}
                for p, x, fs in good:
                    groups.setdefault((x.shape[1], fs), []).append((p, x))
                for (n_ch, fs), items in groups.items():
                    self._run_group(items, n_ch, fs, mf, stats)
        finally:
            pool.shutdown(wait=False)
            mf.close()
        return stats

    def _run_group(self, items, n_ch, fs, mf, stats):
        cfg = self.cfg
        if fs != cfg.sample_rate or n_ch != cfg.n_channels:
            cfg = cfg.replace(sample_rate=fs, n_channels=n_ch)
        t0 = time.perf_counter()
        try:
            payloads = self._encode_batch([x for _, x in items], cfg)
        except Exception:
            payloads = [None] * len(items)     # fall back per clip
            for i, (_, x) in enumerate(items):
                for _ in range(self.retries + 1):
                    try:
                        payloads[i] = self._encode_one(x, cfg)
                        break
                    except Exception:
                        continue
        wall = time.perf_counter() - t0
        for (p, x), payload in zip(items, payloads):
            if payload is None:
                self._record(mf, stats, p, "quarantined")
                continue
            data = _header_bytes(cfg, x.shape[1], x.shape[0]) + payload
            out = os.path.join(self.out_dir, os.path.splitext(
                os.path.basename(p))[0] + ".pac")
            with open(out, "wb") as fo:
                fo.write(data)
            dur = x.shape[0] / fs
            self._record(mf, stats, p, "ok", out=out, seconds=dur,
                         kbps=len(data) * 8 / dur / 1000.0,
                         wall_s=wall / len(items))

    @staticmethod
    def _safe_read(path):
        try:
            return read_wav(path)
        except Exception:
            return None, None

    def _record(self, mf, stats, clip, status, **kw):
        rec = {"clip": clip, "status": status, **kw}
        mf.write(json.dumps(rec) + "\n")
        mf.flush()
        if status == "ok":
            stats["ok"] += 1
            stats["audio_s"] += kw.get("seconds", 0.0)
            stats["wall_s"] += kw.get("wall_s", 0.0)
        else:
            stats["failed"] += 1


class CorpusDecoder:
    """PAC-T→WAV over a corpus: the decode mirror of CorpusTranscoder.

    Streams are grouped by (header config, padded frame bucket) and decoded
    in device batches through tac.parallel.decode_batch_packed (optionally
    sharded over a mesh clips axis). Zero-padded rows carry all-zero alloc
    codes, which decode to silence past each clip's true frame count, so
    per-clip PCM matches a solo decode to float ulps (within one 16-bit
    LSB after WAV quantization; asserted in tests). Same
    manifest resume + per-clip quarantine contract as the encoder
    (SURVEY.md §5.3-§5.5)."""

    FRAME_BUCKET = 32

    def __init__(self, out_dir: str, manifest: Optional[str] = None,
                 batch_size: Optional[int] = None, retries: int = 1,
                 io_threads: int = 4, mesh=None, precision: str = "fast"):
        from tac import tuning

        self.out_dir = out_dir
        self.manifest_path = manifest or os.path.join(out_dir,
                                                      "decode_manifest.jsonl")
        self.batch_size = batch_size or tuning.corpus_batch_default()
        self.retries = retries
        self.io_threads = io_threads
        self.mesh = mesh
        self.precision = precision
        os.makedirs(out_dir, exist_ok=True)

    def _stage(self, data: bytes):
        """bytes → (hdr, decode cfg, staged rows [C, F, W32])."""
        from tac import api, codec
        from tac.dsp.mdct import num_frames
        from tac.ops import bitpack as dbp

        hdr, off = bs.read_header(data)
        cfg = api.header_config(hdr, self.precision)
        f = num_frames(hdr.num_samples, hdr.n_mdct_lines)
        c = hdr.n_channels
        if cfg.use_block_switch:
            from tac import blockswitch as bsw
            cap = (bsw.capacity_bits_bs_vbr(cfg) if cfg.use_huffman
                   else bsw.capacity_bits_bs(cfg))
        else:
            cap = codec.payload_capacity_bits(cfg)
        w32 = -(-cap // 32)
        offs, lens = bs.split_blocks(data, off, f * c)
        rows = dbp.stream_to_rows(data, offs, lens, w32)
        return hdr, cfg, np.ascontiguousarray(
            rows.reshape(f, c, w32).swapaxes(0, 1))

    def _decode_batch(self, staged: list) -> list[np.ndarray]:
        """staged: list of (hdr, cfg, rows [C, F_i, W32]) with one shared
        cfg/W32 → per-clip int16[T_i, C] PCM (quantized on device)."""
        import jax
        import jax.numpy as jnp

        from tac import parallel

        hdrs = [s[0] for s in staged]
        cfg = staged[0][1]
        h = cfg.n_mdct_lines
        fb_ = max(s[2].shape[1] for s in staged)
        f_pad = max(-(-fb_ // self.FRAME_BUCKET) * self.FRAME_BUCKET, fb_)
        n = len(staged)
        shards = self.mesh.shape["clips"] if self.mesh is not None else 1
        b = -(-n // shards) * shards
        c, w32 = staged[0][2].shape[0], staged[0][2].shape[2]
        words = np.zeros((b, c, f_pad, w32), np.uint32)
        for i, (_, _, rows) in enumerate(staged):
            words[i, :, : rows.shape[1]] = rows
        t_pad = (f_pad - 1) * h
        # pcm16: quantize on device — the PCM pull dominates full-path
        # decode on link-bound hosts, and the output is 16-bit WAV anyway
        if self.mesh is not None:
            y = parallel.decode_batch_packed_sharded(
                parallel.shard_clips(jnp.asarray(words), self.mesh),
                cfg, t_pad, self.mesh, pcm16=True)
        else:
            y = parallel.decode_batch_packed(jax.device_put(words), cfg,
                                             t_pad, pcm16=True)
        y_np = np.asarray(y)
        return [np.ascontiguousarray(y_np[i, :, : hdr.num_samples].T)
                for i, hdr in enumerate(hdrs)]

    def run(self, pac_paths: Sequence[str], log=print) -> dict:
        from tac.io.wav import write_wav

        done = _load_manifest(self.manifest_path)
        todo = [p for p in pac_paths
                if done.get(p, {}).get("status") != "ok"]
        log(f"corpus decode: {len(pac_paths)} streams, "
            f"{len(pac_paths) - len(todo)} already done, {len(todo)} to go")
        stats = {"ok": len(pac_paths) - len(todo), "failed": 0,
                 "audio_s": 0.0, "wall_s": 0.0}
        mf = open(self.manifest_path, "a")
        pool = ThreadPoolExecutor(self.io_threads)
        try:
            for lo in range(0, len(todo), self.batch_size):
                paths = todo[lo:lo + self.batch_size]
                blobs = list(pool.map(self._safe_read_bytes, paths))
                staged, group_paths = {}, {}
                for p, data in zip(paths, blobs):
                    if data is None:
                        self._record(mf, stats, p, "read_error")
                        continue
                    try:
                        hdr, cfg, rows = self._stage(data)
                    except Exception as e:
                        self._record(mf, stats, p, "corrupt",
                                     error=type(e).__name__)
                        continue
                    staged.setdefault(cfg, []).append((hdr, cfg, rows))
                    group_paths.setdefault(cfg, []).append(p)
                for cfg, items in staged.items():
                    self._run_group(items, group_paths[cfg], mf, stats,
                                    write_wav)
        finally:
            pool.shutdown(wait=False)
            mf.close()
        return stats

    def _run_group(self, items, paths, mf, stats, write_wav):
        t0 = time.perf_counter()
        try:
            pcms = self._decode_batch(items)
        except Exception:
            pcms = [None] * len(items)
            for i, it in enumerate(items):
                for _ in range(self.retries + 1):
                    try:
                        pcms[i] = self._decode_batch([it])[0]
                        break
                    except Exception:
                        continue
        wall = time.perf_counter() - t0
        for (hdr, _, _), p, pcm in zip(items, paths, pcms):
            if pcm is None:
                self._record(mf, stats, p, "quarantined")
                continue
            out = os.path.join(self.out_dir, os.path.splitext(
                os.path.basename(p))[0] + ".wav")
            write_wav(out, pcm, hdr.sample_rate)
            dur = hdr.num_samples / hdr.sample_rate
            self._record(mf, stats, p, "ok", out=out, seconds=dur,
                         wall_s=wall / len(items))

    @staticmethod
    def _safe_read_bytes(path):
        try:
            with open(path, "rb") as f:
                return f.read()
        except Exception:
            return None

    _record = CorpusTranscoder._record
