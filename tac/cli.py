"""CLI driver: ``python -m tac.cli {encode,decode,info,bench} ...``.

Capability parity with the reference's __main__ driver (SURVEY.md §2 #13),
plus the flag→config system of SURVEY.md §5.6: named presets for the five
BASELINE.json evaluation configs, overridable per-flag.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from tac.config import CodecConfig, PRESETS


def _add_config_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", choices=sorted(PRESETS), default=None,
                   help="named config (BASELINE.json evaluation rungs)")
    p.add_argument("--bitrate", type=int, help="total bits/s across channels")
    p.add_argument("--lines", type=int, help="nMDCTLines (long block H)")
    p.add_argument("--window", choices=["sine", "kbd", "hann"])
    p.add_argument("--alloc", dest="alloc_mode",
                   choices=["greedy", "uniform", "const_snr", "const_mnr"])
    p.add_argument("--no-psy", action="store_true")
    p.add_argument("--huffman", action="store_true")
    p.add_argument("--huffman-sets", dest="huffman_sets", type=int,
                   choices=[1, 2, 3],
                   help="trained table sets to price (default 2; 3 adds "
                        "the side-channel/low-rate set — worth ~2.5%% "
                        "entropy on 48-64 kbps streams, SPEC.md §8)")
    p.add_argument("--blockswitch", action="store_true")
    p.add_argument("--stereo", dest="stereo_mode", choices=["lr", "ms"],
                   help="ms = mid/side transform + joint allocation "
                        "(SPEC.md §11; stereo input only)")
    p.add_argument("--precision", choices=["parity", "fast"])


def _build_config(args, fs: int | None = None, n_ch: int | None = None
                  ) -> CodecConfig:
    cfg = PRESETS[args.preset] if args.preset else CodecConfig()
    kw = {}
    if fs is not None:
        kw["sample_rate"] = fs
    if n_ch is not None:
        kw["n_channels"] = n_ch
    if args.bitrate:
        kw["bitrate_bps"] = args.bitrate
    if args.lines:
        kw["n_mdct_lines"] = args.lines
    if args.window:
        kw["window"] = args.window
    if args.alloc_mode:
        kw["alloc_mode"] = args.alloc_mode
    if args.no_psy:
        kw["use_psy"] = False
    if args.huffman:
        kw["use_huffman"] = True
    if getattr(args, "huffman_sets", None):
        kw["huffman_sets"] = args.huffman_sets
    if args.blockswitch:
        kw["use_block_switch"] = True
    if getattr(args, "stereo_mode", None):
        kw["stereo_mode"] = args.stereo_mode
    if args.precision:
        kw["precision"] = args.precision
    return cfg.replace(**kw) if kw else cfg


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tac", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode", help="WAV → PAC-T")
    pe.add_argument("input"); pe.add_argument("output")
    _add_config_flags(pe)
    pe.add_argument("-v", "--verbose", action="store_true")
    pe.add_argument("--profile", metavar="DIR",
                    help="write a jax.profiler trace (Perfetto) to DIR")

    pd = sub.add_parser("decode", help="PAC-T → WAV")
    pd.add_argument("input"); pd.add_argument("output")
    pd.add_argument("--precision", choices=["parity", "fast"],
                    default="fast",
                    help="parity = f64 FFT path (needs JAX_ENABLE_X64)")
    pd.add_argument("--start", type=float, default=None, metavar="SEC",
                    help="random-access: first output second "
                         "(api.decode_range — only covering frames decode)")
    pd.add_argument("--duration", type=float, default=None, metavar="SEC",
                    help="random-access: seconds to decode from --start")

    pi = sub.add_parser("info", help="print PAC-T header as JSON")
    pi.add_argument("input")

    pb = sub.add_parser("bench", help="single-clip encode throughput")
    pb.add_argument("input", nargs="?", default=None,
                    help="WAV file (default: synthetic 30 s stereo)")
    _add_config_flags(pb)

    pc = sub.add_parser("corpus", help="batch-transcode WAVs → PAC-T "
                        "(manifest resume, per-clip quarantine)")
    pc.add_argument("inputs", nargs="+", help="WAV files")
    pc.add_argument("-o", "--out-dir", required=True)
    pc.add_argument("--batch-size", type=int, default=None)  # None = per-backend default (tac/tuning.py)
    _add_config_flags(pc)

    pcd = sub.add_parser("corpus-decode", help="batch-decode PAC-T → WAVs "
                         "(manifest resume, per-clip quarantine)")
    pcd.add_argument("inputs", nargs="+", help="PAC-T files")
    pcd.add_argument("-o", "--out-dir", required=True)
    pcd.add_argument("--batch-size", type=int, default=None)
    pcd.add_argument("--precision", choices=["parity", "fast"],
                     default="fast")

    args = ap.parse_args(argv)

    if args.cmd == "encode":
        from tac.io.wav import read_wav
        from tac import api
        x, fs = read_wav(args.input)
        cfg = _build_config(args, fs=fs, n_ch=x.shape[1])
        t0 = time.time()
        if getattr(args, "profile", None):
            import jax
            with jax.profiler.trace(args.profile):
                stats = api.encode(args.input, args.output, cfg)
        else:
            stats = api.encode(args.input, args.output, cfg)
        stats["encode_s"] = round(time.time() - t0, 3)
        print(json.dumps(stats))
        return 0

    if args.cmd == "decode":
        from tac import api
        t0 = time.time()
        if args.start is not None or args.duration is not None:
            from tac import bitstream as bs
            from tac.io.wav import write_wav
            with open(args.input, "rb") as f:
                data = f.read()
            hdr, _ = bs.read_header(data)
            s0 = int(round((args.start or 0.0) * hdr.sample_rate))
            s1 = (s0 + int(round(args.duration * hdr.sample_rate))
                  if args.duration is not None else hdr.num_samples)
            x, fs = api.decode_range(data, s0, s1, args.precision)
            write_wav(args.output, x, fs)
            stats = {"seconds": x.shape[0] / fs, "sample_rate": fs,
                     "channels": x.shape[1], "start_sample": s0}
        else:
            stats = api.decode(args.input, args.output, args.precision)
        stats["decode_s"] = round(time.time() - t0, 3)
        print(json.dumps(stats))
        return 0

    if args.cmd == "info":
        from tac import bitstream as bs
        with open(args.input, "rb") as f:
            data = f.read()
        hdr, off = bs.read_header(data)
        d = {k: (v.tolist() if hasattr(v, "tolist") else v)
             for k, v in vars(hdr).items()}
        d["header_bytes"] = off
        d["total_bytes"] = len(data)
        print(json.dumps(d))
        return 0

    if args.cmd == "bench":
        import numpy as np
        from tac import api
        if args.input:
            from tac.io.wav import read_wav
            x, fs = read_wav(args.input)
        else:
            fs = 44100
            rng = np.random.default_rng(0)
            t = np.arange(fs * 30) / fs
            x = np.stack([0.4 * np.sin(2 * np.pi * 440 * t),
                          0.4 * np.sin(2 * np.pi * 554 * t)], 1)
            x += 0.01 * rng.standard_normal(x.shape)
        cfg = _build_config(args, fs=fs, n_ch=x.shape[1])
        api.encode_array(x, cfg)                     # compile
        t0 = time.time()
        data = api.encode_array(x, cfg)
        dt = time.time() - t0
        dur = x.shape[0] / fs
        print(json.dumps({"audio_s": dur, "encode_s": round(dt, 4),
                          "throughput_x": round(dur / dt, 2),
                          "kbps": round(len(data) * 8 / dur / 1000, 1)}))
        return 0

    if args.cmd == "corpus":
        from tac.corpus import CorpusTranscoder
        cfg = _build_config(args)
        tc = CorpusTranscoder(cfg, args.out_dir, batch_size=args.batch_size)
        stats = tc.run(args.inputs)
        print(json.dumps(stats))
        return 0

    if args.cmd == "corpus-decode":
        from tac.corpus import CorpusDecoder
        dec = CorpusDecoder(args.out_dir, batch_size=args.batch_size,
                            precision=args.precision)
        stats = dec.run(args.inputs)
        print(json.dumps(stats))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
