"""Multi-chip parallelism: mesh construction, sharded corpus encode/decode.

The reference has NO parallelism (SURVEY.md §2.9) — this module is the
TPU-native subsystem that replaces its serial per-file bash loop
(SURVEY.md §3.5) with SPMD over a device mesh:

  * **DP / "clips" axis** — corpus transcode: `shard_map` the per-clip
    encode over a `Mesh(("clips", ...))`; embarrassingly parallel, no
    collectives in the encode graph (BASELINE.json:10).
  * **SP / "frames" axis** — the codec's entire sequence-parallel story
    (SURVEY.md §5.7): the decode overlap-add couples adjacent frames by one
    half-frame, so sharding the frame axis needs exactly one `ppermute`
    halo exchange of the dangling H-sample tail per boundary.
  * **Metrics** — corpus SNR/bit statistics reduce with `psum` over the
    mesh (SURVEY.md §5.8); the only other authored collective.

TP/PP/EP have no analogue here (no weight matrices, no experts) — stated in
SURVEY.md §2.9 so they are not invented.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tac import codec
from tac.codec import FrameCode
from tac.config import CodecConfig
from tac.dsp import mdct as fb


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up (SURVEY.md §5.8): `jax.distributed.initialize`
    from explicit args or the standard env (TPU pods auto-detect). Safe to
    call on a single host (no-op if no coordinator is configured).

    Returns the global device count. After this, `make_mesh()` sees every
    chip in the slice; XLA routes the clips/frames collectives over ICI
    within a slice and DCN across slices.
    """
    if coordinator or num_processes or "COORDINATOR_ADDRESS" in \
            __import__("os").environ:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return len(jax.devices())


def make_mesh(n_clips: Optional[int] = None, n_frames: int = 1,
              devices=None) -> Mesh:
    """Mesh over ("clips", "frames"): DP outer, frame-axis SP inner.

    Defaults to all visible devices on the clips axis.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_clips is None:
        n_clips = len(devices) // n_frames
    devices = devices[: n_clips * n_frames].reshape(n_clips, n_frames)
    return Mesh(devices, ("clips", "frames"))


# ----------------------------------------------------------- encode (DP) ----

def encode_batch(x, cfg: CodecConfig) -> FrameCode:
    """Single-device batched encode. x: [B, C, T] → FrameCode [B, C, F, ...]."""
    return _encode_batch_jit(x, cfg)


@partial(jax.jit, static_argnums=(1,))
def _encode_batch_jit(x, cfg: CodecConfig):
    c = codec.make_consts(cfg)
    frames = codec.fb.frame_signal(x.astype(c.dtype), cfg.n_mdct_lines)
    lead = frames.shape[:-1]                  # [B, C, F]
    code = codec._encode_rows(frames.reshape(-1, frames.shape[-1]), cfg, c)
    return jax.tree_util.tree_map(
        lambda l: l.reshape(*lead, *l.shape[1:]), code)


def _packed_encode_impl(cfg: CodecConfig):
    """The jitted packed-encode entry for cfg's stream family (the decode
    mirror is _packed_decode_impl). All four flatten leading axes — raw
    and bs over one frame-row axis, the VBR families over reservoir
    lanes — so [B, C, T] batches produce per-clip bytes identical to
    solo encodes (tests/test_corpus.py)."""
    if cfg.use_block_switch:
        from tac import blockswitch as bsw
        return (bsw._encode_bs_vbr_packed_leading if cfg.use_huffman
                else bsw._encode_bs_packed_leading)
    return (codec._encode_vbr_packed_leading if cfg.use_huffman
            else codec._encode_packed_leading)


def encode_batch_packed(x, cfg: CodecConfig):
    """Batched device-packed encode. x: [B, C, T] →
    (words uint32[B, C, F, W32], nbits int32[B, C, F])."""
    return _encode_batch_packed_jit(x, cfg)


def _encode_batch_packed_jit(x, cfg: CodecConfig):
    # one flat frame-row/lane axis across (batch, channels): ENC_CHUNK
    # bounds the per-program size regardless of batch shape
    return _packed_encode_impl(cfg)(x, cfg)


def encode_batch_packed_sharded(x, cfg: CodecConfig, mesh: Mesh):
    """Corpus packed encode over the mesh clips axis: each device encodes
    AND bit-packs its clip shard; only payload words leave the devices.
    x: [B, C, T] with B divisible by the clips axis size."""
    impl = _packed_encode_impl(cfg)

    @partial(shard_map, mesh=mesh, in_specs=P("clips"),
             out_specs=(P("clips"), P("clips")), check_vma=False)
    def run(xs):
        return impl.__wrapped__(xs, cfg)

    return jax.jit(run)(x)


def encode_batch_sharded(x, cfg: CodecConfig, mesh: Mesh) -> FrameCode:
    """Corpus encode over the mesh clips axis. x: [B, C, T], B divisible by
    the clips axis size. Pure DP: out leaves stay sharded on "clips"."""

    # check_vma off: the bit-allocation while_loop carry starts from
    # replicated zeros, which the varying-axis checker rejects; the graph is
    # collective-free pure DP, so there is nothing for the checker to verify.
    @partial(shard_map, mesh=mesh, in_specs=P("clips"),
             out_specs=jax.tree_util.tree_map(lambda _: P("clips"),
                                              _framecode_struct()),
             check_vma=False)
    def run(xs):
        return jax.vmap(lambda xi: _encode_clip_inline(xi, cfg))(xs)

    return jax.jit(run)(x)


def _framecode_struct():
    return FrameCode(ovs=0, alloc_code=0, scale=0, mant=0)


def _encode_clip_inline(x, cfg: CodecConfig) -> FrameCode:
    """encode_clip body without its own jit wrapper (shard_map-inlineable).
    Chunked like the single-device path so per-device row counts stay
    bounded on real slices."""
    c = codec.make_consts(cfg)
    frames = fb.frame_signal(x.astype(c.dtype), cfg.n_mdct_lines)
    ch, f = frames.shape[0], frames.shape[1]
    code = codec._encode_rows(frames.reshape(ch * f, -1), cfg, c)
    return jax.tree_util.tree_map(
        lambda l: l.reshape(ch, f, *l.shape[1:]), code)


# ------------------------------------------------- decode (DP + SP halo) ----

def _overlap_add_halo(y, h: int):
    """Frame-axis-sharded overlap-add body. y: [C, F_loc, N] (local shard of
    the frame axis) → [C, F_loc, H] local output rows.

    Each local accumulator has one dangling H-sample tail that belongs to
    the NEXT shard's first row — sent with a single non-wrapping ppermute
    (the codec's one true sequence-parallel collective, SURVEY.md §5.7).
    """
    first, second = y[..., :h], y[..., h:]
    zero = jnp.zeros_like(first[..., :1, :])
    acc = (jnp.concatenate([first, zero], axis=-2)
           + jnp.concatenate([zero, second], axis=-2))   # [C, F_loc+1, H]
    nf = lax.axis_size("frames")
    tail = acc[..., -1:, :]
    recv = lax.ppermute(tail, "frames",
                        [(i, i + 1) for i in range(nf - 1)])
    return acc[..., :-1, :].at[..., :1, :].add(recv)


def decode_batch_sharded(code: FrameCode, cfg: CodecConfig, t: int,
                         mesh: Mesh):
    """Sharded decode: clips DP x frames SP. code leaves: [B, C, F, ...].
    Returns [B, C, T]. The frame axis is zero-padded up to a multiple of the
    frames mesh axis — zero frames decode to silence past the output slice."""
    h = cfg.n_mdct_lines
    nf = mesh.shape["frames"]
    f = code.ovs.shape[2]
    pad_f = (-f) % nf
    if pad_f:
        code = FrameCode(*[
            jnp.pad(l, [(0, 0), (0, 0), (0, pad_f)] + [(0, 0)] * (l.ndim - 3))
            for l in code])

    @partial(shard_map, mesh=mesh,
             in_specs=(jax.tree_util.tree_map(
                 lambda _: P("clips", None, "frames"), _framecode_struct()),),
             out_specs=P("clips", None, "frames"),
)
    def run(codes):
        c = codec.make_consts(cfg)
        f = jax.vmap(jax.vmap(jax.vmap(
            lambda fc: codec.decode_frame(fc, cfg, c))))
        y = f(codes)                                      # [b, C, F_loc, N]
        return jax.vmap(lambda yi: _overlap_add_halo(yi, h))(y)

    out = jax.jit(run)(code)                              # [B, C, F, H]
    flat = out.reshape(*out.shape[:-2], -1)               # [B, C, F*H]
    return flat[..., h:h + t]


def _packed_decode_impl(cfg: CodecConfig):
    """The jitted packed-decode entry for cfg's stream family (all four
    flatten leading axes, so [B, C, F, W32] batches ride the row axis)."""
    if cfg.use_block_switch:
        from tac import blockswitch as bsw
        return (bsw._decode_clip_bs_vbr_packed_impl if cfg.use_huffman
                else bsw._decode_clip_bs_packed_impl)
    return (codec._decode_clip_vbr_packed_impl if cfg.use_huffman
            else codec._decode_clip_packed_impl)


@jax.jit
def _to_pcm16(y):
    """Device-side 16-bit PCM quantize (same rounding as tac.io.wav):
    halves the device→host PCM transfer, which dominates full-path decode
    on link-bound hosts — the consumer writes 16-bit WAV anyway."""
    return jnp.clip(jnp.round(y * 32768.0), -32768, 32767).astype(jnp.int16)


def decode_batch_packed(words, cfg: CodecConfig, t: int, huffman=None,
                        pcm16: bool = False):
    """Batched packed decode, the mirror of encode_batch_packed: staged
    payload rows uint32[B, C, F, W32] → [B, C, T] in one fused graph.
    Batching amortizes per-call dispatch + transfer latency exactly as it
    does on encode. The family comes from cfg (use_huffman /
    use_block_switch); `huffman` is accepted for call-site symmetry.
    pcm16=True converts to int16 on device before the pull."""
    if huffman is not None:
        cfg = cfg.replace(use_huffman=huffman)
    y = _packed_decode_impl(cfg)(words, cfg, t)
    return _to_pcm16(y) if pcm16 else y


def decode_batch_packed_sharded(words, cfg: CodecConfig, t: int, mesh: Mesh,
                                huffman=None, pcm16: bool = False):
    """Corpus packed decode over the mesh clips axis: each device unpacks
    and decodes its clip shard; only payload words go up, PCM comes back
    sharded. words: uint32[B, C, F, W32], B divisible by the clips axis."""
    if huffman is not None:
        cfg = cfg.replace(use_huffman=huffman)
    impl = _packed_decode_impl(cfg)

    @partial(shard_map, mesh=mesh, in_specs=P("clips"),
             out_specs=P("clips"), check_vma=False)
    def run(ws):
        y = impl.__wrapped__(ws, cfg, t)
        return _to_pcm16(y) if pcm16 else y

    return jax.jit(run)(words)


# --------------------------------------------------------------- metrics ----

def corpus_metrics_sharded(x, y, mesh: Mesh):
    """Mean SNR (dB) and per-clip SNRs across the sharded corpus.

    x, y: [B, C, T] sharded on "clips". The mean reduces with psum over the
    mesh (SURVEY.md §5.8). Returns (mean_snr, snr[B]).
    """

    @partial(shard_map, mesh=mesh, in_specs=(P("clips"), P("clips")),
             out_specs=(P(), P("clips")))
    def run(xs, ys):
        err = jnp.mean((xs - ys) ** 2, axis=(1, 2))
        sig = jnp.mean(xs ** 2, axis=(1, 2))
        snr = 10.0 * jnp.log10(jnp.maximum(sig, 1e-30)
                               / jnp.maximum(err, 1e-30))
        total = lax.psum(jnp.sum(snr), "clips")
        n = lax.psum(snr.shape[0] * jnp.ones(()), "clips")
        mean = (total / n) * jnp.ones(())
        return mean, snr

    return jax.jit(run)(x, y)


def shard_clips(x, mesh: Mesh):
    """Place a [B, ...] host array sharded over the mesh clips axis."""
    spec = P("clips")
    return jax.device_put(x, NamedSharding(mesh, spec))
