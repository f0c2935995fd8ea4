"""Oracle end-to-end driver (serial block loop). SURVEY.md §2 #13, §3.1–§3.2.

The reference's __main__ encode/decode loop, as functions. This is the
measured baseline path for BASELINE.md ("reference encode speed"):
single-threaded Python/NumPy, per-block, bit-by-bit.
"""

from __future__ import annotations

import numpy as np

from tac.config import CodecConfig
from tac.oracle.audiofile import CodingParams
from tac.oracle.pacfile import PACFile
from tac.oracle.wavfile import WAVFile


def encode(wav_path: str, pac_path: str, cfg: CodecConfig) -> None:
    wav = WAVFile(wav_path)
    cp = wav.OpenForReading()
    cfg = cfg.replace(sample_rate=cp.sampleRate, n_channels=cp.nChannels)
    cp.nSamplesPerBlock = cfg.n_mdct_lines
    pac = PACFile(pac_path, cfg)
    pac.OpenForWriting(cp)
    while True:
        data = wav.ReadDataBlock(cp)
        if data is None:
            break
        pac.WriteDataBlock(data, cp)
    pac.Close(cp)
    wav.Close(cp)


def decode(pac_path: str, wav_path: str,
           cfg: CodecConfig | None = None) -> None:
    pac = PACFile(pac_path, cfg or CodecConfig())
    cp = pac.OpenForReading()
    out = WAVFile(wav_path)
    out.OpenForWriting(cp)
    while True:
        data = pac.ReadDataBlock(cp)
        if data is None:
            break
        out.WriteDataBlock(data, cp)
    out.Close(cp)
    pac.Close(cp)


# Array-level equivalents (for tests/bench; same serial block loop).

def encode_array(x: np.ndarray, cfg: CodecConfig) -> bytes:
    """x: float[T] or [T, C] → PAC-T bytes (byte-compatible with tac.api)."""
    import io

    x = np.asarray(x, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    t, c = x.shape
    cfg = cfg.replace(n_channels=c)
    h = cfg.n_mdct_lines
    cp = CodingParams(sampleRate=cfg.sample_rate, nChannels=c, numSamples=t,
                      nSamplesPerBlock=h)
    pac = PACFile("<mem>", cfg)
    pac.fp = io.BytesIO()
    pac.WriteFileHeader(cp)
    n_blocks = -(-t // h)
    xp = np.concatenate([x, np.zeros((n_blocks * h - t, c))])
    for i in range(n_blocks):
        pac.WriteDataBlock([xp[i * h:(i + 1) * h, ch] for ch in range(c)], cp)
    pac.WriteDataBlock([np.zeros(h)] * c, cp)        # flush tail
    data = pac.fp.getvalue()
    pac.fp.close()
    del pac._prior                                   # Close must not re-flush
    return data


def decode_array(data: bytes, cfg: CodecConfig | None = None
                 ) -> tuple[np.ndarray, int]:
    """PAC-T bytes → (float64[T, C], sample_rate)."""
    import io

    pac = PACFile("<mem>", cfg or CodecConfig())
    pac.fp = io.BytesIO(data)
    cp = pac.ReadFileHeader()
    chunks = []
    while True:
        out = pac.ReadDataBlock(cp)
        if out is None:
            break
        chunks.append(np.stack(out, axis=1))
    x = np.concatenate(chunks, axis=0)[:cp.numSamples]
    return x, cp.sampleRate
