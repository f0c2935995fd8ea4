"""Decode-side throughput on the live backend (VERDICT r1: decode measured
78 audio-sec/s vs encode 240 — a 3x asymmetry to close with device unpack).

Measures audio-sec decoded per wall-second, full path (bytes -> PCM on
host), plus device-only (staged rows resident, decode graph + tiny pull),
for the three stream families. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache = os.environ.get("TAC_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tac import api, bitstream as bs, codec
    from tac.config import PRESETS
    from tac.dsp.mdct import num_frames
    from tac.ops import bitpack as dbp

    secs = float(os.environ.get("TAC_BENCH_SECONDS", 60))
    fs = 44100
    t = np.arange(int(fs * secs)) / fs
    rng = np.random.default_rng(0)
    sig = sum(a * np.sin(2 * np.pi * f * t)
              for a, f in [(0.4, 440), (0.2, 880), (0.1, 1320), (0.03, 3080)])
    x = np.stack([sig, 0.8 * sig + 0.02 * rng.standard_normal(len(t))], 1)

    fams = {"raw": PRESETS["stereo44-128"],
            "vbr": PRESETS["vbr-huffman"],
            "bs": PRESETS["streaming-ll"].replace(n_channels=2),
            "combo": PRESETS["vbr-bs"]}
    out = {}
    for name, cfg in fams.items():
        data = api.encode_array(x[:, : cfg.n_channels], cfg)

        y = api.decode_array(data, precision="fast")  # compile warm
        iters = 5
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            y, _ = api.decode_array(data, precision="fast")
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        out[f"{name}_full"] = round(secs / dt, 1)

        # device-only: pre-staged words resident on device, jitted decode,
        # block until the output exists on device (no host pull of PCM)
        hdr, off = bs.read_header(data)
        dcfg = cfg.replace(use_psy=False, precision="fast")
        f = num_frames(hdr.num_samples, cfg.n_mdct_lines)
        c = cfg.n_channels
        offs, lens = bs.split_blocks(data, off, f * c)
        if cfg.use_block_switch:
            from tac import blockswitch as bsw
            cap = (bsw.capacity_bits_bs_vbr(dcfg) if cfg.use_huffman
                   else bsw.capacity_bits_bs(dcfg))
            dec = (bsw.decode_clip_bs_vbr_packed if cfg.use_huffman
                   else bsw.decode_clip_bs_packed)
        else:
            cap = codec.payload_capacity_bits(dcfg)
            dec = (codec.decode_clip_vbr_packed if cfg.use_huffman
                   else codec.decode_clip_packed)
        w32 = -(-cap // 32)
        rows = dbp.stream_to_rows(data, offs, lens, w32)
        words = jax.device_put(jnp.asarray(np.ascontiguousarray(
            rows.reshape(f, c, w32).swapaxes(0, 1))))
        # fence with a scalar pull: block_until_ready is unreliable over
        # this remote tunnel (bench.py's long-standing note).
        # K decodes chain inside ONE dispatch: a single 60-s decode is
        # ~3 ms of chip compute vs ~28 ms tunnel RPC, so a one-dispatch
        # measurement reports the link, not the codec (the pre-round-4
        # numbers ~2100 were exactly 60/RPC). The carry-dependent select
        # defeats DCE/overlap without changing runtime work (carry is
        # never negative, XLA can't prove it).
        k_chain = 16

        def chained(w):
            def body(carry, _):
                w2 = jnp.where(carry < 0, w ^ jnp.uint32(1), w)
                s = jnp.sum(dec(w2, dcfg, hdr.num_samples))
                return s.astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=k_chain)
            return s

        devfn = jax.jit(chained)
        np.asarray(devfn(words))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(devfn(words))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts)) / k_chain
        out[f"{name}_device"] = round(secs / dt, 1)

        # batched full path: 8 clips per dispatch, the symmetric mirror of
        # bench.py's encode measurement — amortizes the tunnel RTT +
        # dispatch latency that dominates the single-clip number
        from tac import parallel
        b = 8
        blobs = [data] * b

        def batched_decode():
            ws = []
            for d in blobs:                          # host staging per clip
                h2, o2 = bs.read_header(d)
                of2, ln2 = bs.split_blocks(d, o2, f * c)
                r2 = dbp.stream_to_rows(d, of2, ln2, w32)
                ws.append(r2.reshape(f, c, w32).swapaxes(0, 1))
            wb = jnp.asarray(np.ascontiguousarray(np.stack(ws)))
            # pcm16: device-side int16 quantize halves the PCM pull, the
            # dominant transfer on this link (the corpus decoder's path)
            return np.asarray(parallel.decode_batch_packed(
                wb, dcfg, hdr.num_samples, pcm16=True))

        batched_decode()                             # compile warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            batched_decode()
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        out[f"{name}_batched_full"] = round(b * secs / dt, 1)

    print(json.dumps({"metric": "decode_throughput",
                      "unit": "audio_sec_per_sec_per_chip",
                      "clip_seconds": secs, "clips_batched": 8,
                      "backend": jax.default_backend(), **out}))


if __name__ == "__main__":
    main()
