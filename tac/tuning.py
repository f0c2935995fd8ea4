"""Backend auto-tuning: pick ENC_CHUNK without env vars (VERDICT r2 item 5).

The encode row-chunk size trades program count against per-program size:
2048 rows/program measures ~+15% full-path over 1024 on a healthy
backend, but some TPU runtimes (this box's tunneled worker) fault
intermittently past ~1.7k rows/program — and a faulted PJRT client
never recovers in-process. So the 2048 probe cannot be a try/except
around a live encode; it runs ONCE in a throwaway subprocess, and the
verdict persists per (backend, device-kind) in a small JSON cache:

  * cache says 2048 → healthy backend, default gets the +15%;
  * cache says 1024 → known-faulty, stable default, zero env vars;
  * no cache, TPU backend → probe now (one-time ~1 min), then record.

A production fault while auto-2048 is active downgrades the cache for
the NEXT process (record_fault — the current client is already dead).
TAC_ENC_CHUNK always overrides; TAC_AUTOTUNE=0 disables probing
(defaults to the safe 1024).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SAFE_CHUNK = 1024
FAST_CHUNK = 2048

_cached: dict[str, int] = {}


def _cache_path() -> str:
    root = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(root, "tac", "autotune.json")


def _key() -> str:
    try:
        import jax
        dev = jax.devices()[0]
        return f"{jax.default_backend()}:{getattr(dev, 'device_kind', '?')}"
    except Exception:
        return "unknown"


def _load() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _store(data: dict) -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except Exception:
        pass


_PROBE_SRC = r"""
import numpy as np, jax.numpy as jnp
from tac import codec
from tac.config import PRESETS
cfg = PRESETS["stereo44-128"]
t = np.arange(1024 * 1100 + 1024, dtype=np.float64) / 44100.0
x = jnp.asarray(np.stack([np.sin(2 * np.pi * 440 * t)] * 2), jnp.float32)
for _ in range(3):
    w, nb = codec.encode_clip_packed(x, cfg)
    np.asarray(nb)
print("TAC_PROBE_OK")
"""


def _probe() -> bool:
    """Run a >2k-row 2048-chunk encode three times in a subprocess."""
    env = dict(os.environ)
    env["TAC_ENC_CHUNK"] = str(FAST_CHUNK)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE_SRC], env=env,
                             capture_output=True, timeout=900)
        return out.returncode == 0 and b"TAC_PROBE_OK" in out.stdout
    except Exception:
        return False


def enc_chunk() -> int:
    """Effective encode row-chunk for this process (trace-time constant)."""
    env = os.environ.get("TAC_ENC_CHUNK")
    if env:
        return int(env)
    key = _key()
    if key in _cached:
        return _cached[key]
    if not key.startswith("tpu"):
        _cached[key] = SAFE_CHUNK        # chunking is a TPU program-size knob
        return SAFE_CHUNK
    data = _load()
    if key in data:
        _cached[key] = int(data[key])
        return _cached[key]
    if os.environ.get("TAC_AUTOTUNE") == "0":
        _cached[key] = SAFE_CHUNK
        return SAFE_CHUNK
    ok = _probe()
    data = _load()
    data[key] = FAST_CHUNK if ok else SAFE_CHUNK
    _store(data)
    _cached[key] = data[key]
    return _cached[key]


_dispatch_ms: float | None = None


def _null_dispatch_ms() -> float:
    """Median round-trip of a trivial jitted dispatch (once per process).

    The cheap link-health probe: locally-attached TPUs measure well under
    1 ms; this box's remote tunnel measures ~27-30 ms (PERF.md). Used to
    size host<->device batching policies without env vars."""
    global _dispatch_ms
    if _dispatch_ms is None:
        import time

        import jax
        import jax.numpy as jnp
        import numpy as np

        try:
            f = jax.jit(lambda v: v + 1.0)
            v = jnp.zeros(8, jnp.float32)
            np.asarray(f(v))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(v))
                ts.append((time.perf_counter() - t0) * 1e3)
            _dispatch_ms = float(np.median(ts))
        except Exception:
            _dispatch_ms = float("inf")
    return _dispatch_ms


def corpus_batch_default() -> int:
    """Default corpus batch size, derived per backend (VERDICT r3 item 3).

    The VBR lane-batch ladder measures throughput rising to a knee at
    ~32 clips (PERF.md ladder: 3143/5938/6516 aps at 8/32/64 x 60-s
    clips), so healthy locally-attached TPUs default to the knee. Link-bound boxes (remote tunnel, >5 ms null dispatch)
    and CPU backends stay at 8: there the batch upload is the bottleneck
    and large batches only grow the failure blast radius (corpus.py
    falls back per-clip on a batch fault). TAC_CORPUS_BATCH overrides."""
    env = os.environ.get("TAC_CORPUS_BATCH")
    if env:
        return max(int(env), 1)
    if not _key().startswith("tpu"):
        return 8
    return 32 if _null_dispatch_ms() <= 5.0 else 8


def record_fault() -> None:
    """Downgrade the cached chunk after a live backend fault (the current
    PJRT client is unrecoverable; this fixes the NEXT process)."""
    key = _key()
    if _cached.get(key, SAFE_CHUNK) <= SAFE_CHUNK \
            or os.environ.get("TAC_ENC_CHUNK"):
        return
    data = _load()
    data[key] = SAFE_CHUNK
    _store(data)
    _cached[key] = SAFE_CHUNK
