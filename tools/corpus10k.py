"""BASELINE config 4 at its stated scale: a 10k-clip corpus transcode
(VERDICT r3 item 4 — the corpus subsystem's first run at its design
point). Phases (each resumable / independently invokable):

  gen     synthesize N deterministic stereo WAVs via tools/make_corpus.py
          (castanets/speech-like/glockenspiel/tonal mixes — the ONE
          corpus definition) + ONE deliberately corrupt WAV under its
          own name to exercise quarantine
  encode  tac corpus run (manifest resume; kill+rerun resumes) — records
          steady-state audio-sec/s and peak RSS every PROGRESS clips
  decode  corpus-decode everything back, same records
  report  summarize both manifests (ok/failed counts, throughput, RSS)

Run:  python tools/corpus10k.py [gen|encode|decode|report|all]
Env:  TAC_C10K_N (default 10000), TAC_C10K_DIR (default /tmp/tac_c10k),
      TAC_C10K_SECONDS (default 2.0 per clip).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("TAC_C10K_N", 10000))
DIR = os.environ.get("TAC_C10K_DIR", "/tmp/tac_c10k")
SECS = float(os.environ.get("TAC_C10K_SECONDS", 2.0))
WAV_DIR = os.path.join(DIR, "wav")
OUT_DIR = os.path.join(DIR, "pac")
DEC_DIR = os.path.join(DIR, "dec")
FS = 44100


def gen() -> None:
    """Delegates to tools/make_corpus.generate — the single corpus
    definition (ADVICE r4: two competing generators collapsed to one)."""
    from tools.make_corpus import generate

    t0 = time.time()
    generate(WAV_DIR, N, SECS, corrupt=True)
    print(f"gen done: {N} clips + 1 corrupt in {time.time() - t0:.0f}s")


def _rss_mb() -> float:
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    if sys.platform == "darwin":          # bytes there, KB on Linux
        rss /= 1024.0
    return rss / 1024.0


def encode() -> None:
    import jax

    cache = os.environ.get("TAC_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tac.config import PRESETS
    from tac.corpus import CorpusTranscoder

    paths = sorted(os.path.join(WAV_DIR, p) for p in os.listdir(WAV_DIR)
                   if p.endswith(".wav"))
    tc = CorpusTranscoder(PRESETS["corpus"], OUT_DIR)
    print(f"encode: {len(paths)} clips, batch={tc.batch_size}", flush=True)
    t0 = time.time()
    stats = tc.run(paths, log=lambda *a: None)
    dt = time.time() - t0
    audio = stats["ok"] * SECS
    rec = {"phase": "encode", **stats, "wall_s": round(dt, 1),
           "audio_sec_per_s": round(audio / dt, 1),
           "peak_rss_mb": round(_rss_mb(), 1),
           "batch_size": tc.batch_size}
    print(json.dumps(rec), flush=True)
    with open(os.path.join(DIR, "report.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def decode() -> None:
    import jax

    cache = os.environ.get("TAC_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tac.corpus import CorpusDecoder

    paths = sorted(os.path.join(OUT_DIR, p) for p in os.listdir(OUT_DIR)
                   if p.endswith(".pac"))
    dec = CorpusDecoder(DEC_DIR)
    print(f"decode: {len(paths)} streams, batch={dec.batch_size}",
          flush=True)
    t0 = time.time()
    stats = dec.run(paths, log=lambda *a: None)
    dt = time.time() - t0
    audio = stats["ok"] * SECS
    rec = {"phase": "decode", **stats, "wall_s": round(dt, 1),
           "audio_sec_per_s": round(audio / dt, 1),
           "peak_rss_mb": round(_rss_mb(), 1),
           "batch_size": dec.batch_size}
    print(json.dumps(rec), flush=True)
    with open(os.path.join(DIR, "report.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def report() -> None:
    for mf, tag in ((os.path.join(OUT_DIR, "manifest.jsonl"), "encode"),
                    (os.path.join(DEC_DIR, "decode_manifest.jsonl"),
                     "decode")):
        if not os.path.exists(mf):
            continue
        recs = {}
        with open(mf) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    recs[r["clip"]] = r
                except json.JSONDecodeError:
                    pass
        ok = sum(1 for r in recs.values() if r.get("status") == "ok")
        bad = {k: r for k, r in recs.items() if r.get("status") != "ok"}
        print(f"{tag}: {ok} ok, {len(bad)} failed/quarantined "
              f"({sorted(bad)[:3]}...)" if bad else
              f"{tag}: {ok} ok, 0 failed")
    if os.path.exists(os.path.join(DIR, "report.jsonl")):
        with open(os.path.join(DIR, "report.jsonl")) as f:
            for line in f:
                print(line.strip())


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase in ("gen", "all"):
        gen()
    if phase in ("encode", "all"):
        encode()
    if phase in ("decode", "all"):
        decode()
    if phase in ("report", "all"):
        report()
