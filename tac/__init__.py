"""tac — TPU-native perceptual audio codec (JAX/XLA/Pallas).

A ground-up, arrays-first rebuild of the capabilities of the
`Abhipray/audio-codec` reference (see SURVEY.md; the reference mount was empty,
so SPEC.md is the frozen normative contract): windowed MDCT/IMDCT filterbank,
FFT psychoacoustic model, greedy per-band bit allocation, block-floating-point
quantization, Huffman VBR, long/short block switching, and a bit-exact PAC-T
bitstream — with per-frame encode vmapped over frames and shard_mapped over
clips for corpus-scale transcoding on TPU meshes.

Public API:
    encode(wav_path, pac_path, config)   decode(pac_path, wav_path)
    encode_array(audio, config) -> bytes decode_array(bytes) -> (audio, fs)
"""

import os as _os

from tac.config import CodecConfig, PRESETS  # noqa: F401

__version__ = "0.1.0"

if _os.environ.get("TAC_COMPILE_CACHE"):
    # persistent XLA compile cache (huge win when device compiles are
    # remote/slow; harmless otherwise)
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["TAC_COMPILE_CACHE"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_API = {"encode": "tac.api", "decode": "tac.api",
        "encode_array": "tac.api", "decode_array": "tac.api",
        "StreamEncoder": "tac.streaming", "StreamDecoder": "tac.streaming",
        "StreamState": "tac.streaming",
        "CorpusTranscoder": "tac.corpus", "CorpusDecoder": "tac.corpus"}


def __getattr__(name):  # lazy: avoid importing jax-heavy modules for config-only use
    if name in _API:
        import importlib
        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(name)
