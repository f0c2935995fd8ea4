"""BASELINE config 4 at its stated scale: a 10k-clip corpus transcode
(VERDICT r3 item 4 — the corpus subsystem's first run at its design
point). Phases (each resumable / independently invokable):

  gen     synthesize N deterministic stereo WAVs (castanets/speech-like/
          glockenspiel/tonal mixes, tools/material.py) + ONE deliberately
          corrupt WAV to exercise quarantine
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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("TAC_C10K_N", 10000))
DIR = os.environ.get("TAC_C10K_DIR", "/tmp/tac_c10k")
SECS = float(os.environ.get("TAC_C10K_SECONDS", 2.0))
WAV_DIR = os.path.join(DIR, "wav")
OUT_DIR = os.path.join(DIR, "pac")
DEC_DIR = os.path.join(DIR, "dec")
FS = 44100


def gen() -> None:
    from tac.io.wav import write_wav
    from tools import material

    os.makedirs(WAV_DIR, exist_ok=True)
    makers = [material.castanets, material.speech_like,
              material.glockenspiel]
    t0 = time.time()
    for i in range(N):
        p = os.path.join(WAV_DIR, f"c{i:05d}.wav")
        if os.path.exists(p):
            continue
        rng = np.random.default_rng(1000 + i)
        base = makers[i % 3](FS, SECS)
        # vary level/phasing per clip so streams differ
        g = 0.4 + 0.5 * rng.random()
        x = np.stack([g * base,
                      0.8 * g * np.roll(base, int(rng.integers(1, 400)))
                      + 0.005 * rng.standard_normal(len(base))], axis=1)
        write_wav(p, np.clip(x, -0.99, 0.99).astype(np.float32), FS)
        if i % 1000 == 0:
            print(f"gen {i}/{N} ({time.time() - t0:.0f}s)", flush=True)
    # one corrupt WAV: truncated header (quarantine exercise)
    bad = os.path.join(WAV_DIR, "c_corrupt.wav")
    with open(os.path.join(WAV_DIR, "c00000.wav"), "rb") as f:
        blob = f.read()
    with open(bad, "wb") as f:
        f.write(blob[:37])
    print(f"gen done: {N} clips + 1 corrupt in {time.time() - t0:.0f}s")


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


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
