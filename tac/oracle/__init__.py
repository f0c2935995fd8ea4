"""Serial NumPy oracle: the spec-frozen, reference-style implementation.

SURVEY.md §0/§4: the reference mount is empty, so this package IS the parity
oracle (SPEC.md §10) and the measured baseline denominator (BASELINE.md row
"reference encode speed"). It is deliberately written the way the reference
is written (SURVEY.md §1–§3): single-threaded, per-block per-channel Python
loops, bit-by-bit ``PackedBits`` I/O, per-masker spreading loop, greedy
``while`` bit allocation — i.e. the architecture the TPU rebuild replaces.

Structure mirrors the reference module inventory (SURVEY.md §2):
  audiofile.py  — CodingParams bag + AudioFile base        (#1)
  wavfile.py    — WAVFile RIFF 16-bit PCM                  (#2)
  pacfile.py    — PACFile coded-file container             (#3)
  codec.py      — per-channel Encode/Decode                (#4)
  mdct.py       — MDCT/IMDCT (slow + FFT)                  (#5)
  window.py     — sine/hann/KBD windows                    (#6)
  quantize.py   — uniform midtread + block-FP, scalar      (#7)
  bitpack.py    — PackedBits MSB-first bit I/O             (#8)
  psychoac.py   — SPL/Bark/Thresh/maskers/CalcSMRs         (#9)
  bitalloc.py   — greedy water-fill + baselines            (#10)
"""

from tac.oracle.api import decode, decode_array, encode, encode_array  # noqa: F401
