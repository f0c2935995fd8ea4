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

from tac.config import CodecConfig, PRESETS  # noqa: F401

__version__ = "0.1.0"

_API = ("encode", "decode", "encode_array", "decode_array")


def __getattr__(name):  # lazy: avoid importing jax-heavy modules for config-only use
    if name in _API:
        from tac import api
        return getattr(api, name)
    raise AttributeError(name)
