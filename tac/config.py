"""Codec configuration.

TPU-first equivalent of the reference's mutable ``CodingParams`` attribute bag
(SURVEY.md §2 #1, §5.6): a frozen, hashable dataclass that is safe to close
over in ``jax.jit`` (it is static — never traced), plus named presets matching
the five BASELINE.json evaluation configs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Static codec parameters. Frozen/hashable → usable as a jit static arg.

    Spec: SPEC.md. Field names follow the frozen spec, not the reference.
    """

    sample_rate: int = 44100
    n_channels: int = 2
    bitrate_bps: int = 128_000          # total across channels

    # Filterbank
    n_mdct_lines: int = 1024            # H (long block); frame N = 2H
    window: str = "sine"                # sine | kbd | hann
    kbd_alpha: float = 4.0

    # Quantization
    n_scale_bits: int = 4               # S
    n_mant_size_bits: int = 4           # A (alloc-field width)
    max_mant_bits: int = 16

    # Psychoacoustics / allocation
    use_psy: bool = True
    alloc_mode: str = "greedy"          # greedy | uniform | const_snr | const_mnr
    psy_noise_maskers: bool = True
    max_maskers: int = 64
    delta_tonal_db: float = 16.0
    delta_noise_db: float = 6.0
    # Masked-threshold granularity (SPEC §5): "band" evaluates the
    # masker spreading at the 2B band-edge Barks with a provably
    # conservative per-band bound (psy.masked_threshold_bands) —
    # measured round 5: 1.50x flagship encode (12.6k -> 18.9k aps),
    # +0.1..+3.0 dB SNR on every fixed-rate leg, worst NMR cell judged
    # by the LINE threshold +0.86 -> -3.03 dB. The default engages it
    # ONLY on the measured-win scope (fast, fixed-rate, lr, no
    # blockswitch — psy.make_consts has the measured boundary story);
    # "line" is the reference-faithful model, always used by parity
    # mode (so oracle parity and goldens are unaffected).
    psy_granularity: str = "band"

    # Entropy coding
    use_huffman: bool = False
    reservoir_factor: int = 4           # reservoir cap = factor * per-block budget
    # Trained table sets the ENCODER prices (SPEC.md §8): 1 = the general
    # set only (rounds 1-3 behavior), 2 = also the transient/short-block
    # set via tableId=2, 3 = also the side-channel/low-rate set via
    # tableId=3 (4-way min). Default 2, decided by measurement (PERF.md
    # round 5): each pricing set costs ~10%/18% batched VBR scan
    # throughput (3981/3578/2933 aps at 1/2/3 sets, interleaved A/B);
    # set 2 converts to +0.7-0.9 dB on transients, set 3's 2.5% entropy
    # margin on low-rate/side streams does NOT convert end-to-end, so 3
    # is opt-in (CLI --huffman-sets 3) where those streams dominate.
    # Decoders always accept any tid the tables on disk cover.
    huffman_sets: int = 2

    # Stereo coding (SPEC.md §11 — an extension BEYOND the reference):
    # "lr" = independent channels (reference behavior); "ms" = mid/side
    # transform + JOINT bit allocation across both channels' bands (one
    # water-fill over 2B bands sharing the frame's total budget — the
    # side channel of correlated material frees its bits for the mid).
    stereo_mode: str = "lr"

    # Block switching / streaming
    use_block_switch: bool = False
    n_mdct_lines_short: int = 128
    transient_ratio: float = 8.0
    transient_energy_min: float = 1e-6

    # Numerics: "parity" = f64 + FFT MDCT (bit-exact vs oracle, CPU),
    # "fast" = f32 matmul/Pallas MDCT (TPU speed path).
    precision: str = "fast"

    def __post_init__(self):
        if self.n_mdct_lines & (self.n_mdct_lines - 1):
            raise ValueError("n_mdct_lines must be a power of two")
        if self.window not in ("sine", "kbd", "hann"):
            raise ValueError(f"unknown window {self.window!r}")
        if self.alloc_mode not in ("greedy", "uniform", "const_snr", "const_mnr"):
            raise ValueError(f"unknown alloc_mode {self.alloc_mode!r}")
        if self.precision not in ("parity", "fast"):
            raise ValueError(f"unknown precision {self.precision!r}")
        if self.psy_granularity not in ("line", "band", "band_all"):
            raise ValueError(
                f"unknown psy_granularity {self.psy_granularity!r} "
                "(line | band [scoped default] | band_all [force])")
        if self.huffman_sets not in (1, 2, 3):
            raise ValueError("huffman_sets must be 1, 2 or 3 (2-bit "
                             "tableId: 0 = raw, 1/2/3 = trained sets)")
        if self.use_block_switch:
            if self.n_mdct_lines % self.n_mdct_lines_short:
                raise ValueError("short lines must divide long lines")
        if self.stereo_mode not in ("lr", "ms"):
            raise ValueError(f"unknown stereo_mode {self.stereo_mode!r}")
        if self.stereo_mode == "ms":
            if self.n_channels % 2:
                raise ValueError(
                    "stereo_mode='ms' requires an even n_channels "
                    "(adjacent channels butterfly pairwise, SPEC.md §11)")

    # ---- derived (all python ints: static under jit) ----

    @property
    def frame_size(self) -> int:
        return 2 * self.n_mdct_lines

    @property
    def short_factor(self) -> int:
        return self.n_mdct_lines // self.n_mdct_lines_short

    def bits_per_block_channel(self, n_lines: Optional[int] = None) -> int:
        """Total payload bit budget per (block, channel). SPEC.md §6."""
        h = self.n_mdct_lines if n_lines is None else n_lines
        return (self.bitrate_bps * h) // (self.sample_rate * self.n_channels)

    def replace(self, **kw) -> "CodecConfig":
        return dataclasses.replace(self, **kw)


# The five BASELINE.json evaluation configs (BASELINE.md "ladder rungs").
PRESETS = {
    # 1. Mono 16 kHz, 1024-pt sine MDCT, uniform quantizer, fixed 64 kbps.
    "mono16-64": CodecConfig(
        sample_rate=16_000, n_channels=1, bitrate_bps=64_000,
        n_mdct_lines=512, use_psy=False, alloc_mode="uniform",
        precision="parity",
    ),
    # 2. Stereo 44.1 kHz, full psy model, greedy allocation @128 kbps.
    "stereo44-128": CodecConfig(
        sample_rate=44_100, n_channels=2, bitrate_bps=128_000,
        n_mdct_lines=1024, use_psy=True, alloc_mode="greedy",
    ),
    # 3. Huffman VBR (bitrate swept 32–256k by the caller).
    "vbr-huffman": CodecConfig(
        sample_rate=44_100, n_channels=2, bitrate_bps=128_000,
        use_psy=True, use_huffman=True,
    ),
    # 4. Corpus transcode (same codec as 2; parallelism lives in tac.parallel).
    "corpus": CodecConfig(
        sample_rate=44_100, n_channels=2, bitrate_bps=128_000,
        use_psy=True,
    ),
    # 5. Low-latency streaming with block switching (<20 ms delay:
    #    2*256/44100 = 11.6 ms).
    "streaming-ll": CodecConfig(
        sample_rate=44_100, n_channels=1, bitrate_bps=96_000,
        n_mdct_lines=256, n_mdct_lines_short=64, use_block_switch=True,
        use_psy=True,
    ),
    # 6. Huffman VBR + block switching combined (SPEC.md §8 + §9: the
    #    windowState-aware bit reservoir; v2 lifts the v1 veto).
    "vbr-bs": CodecConfig(
        sample_rate=44_100, n_channels=2, bitrate_bps=128_000,
        use_psy=True, use_huffman=True, use_block_switch=True,
    ),
    # 7. Mid/side joint-stereo (SPEC.md §11 — beyond the reference):
    #    config 2 with the M/S transform + joint 2B-band allocation.
    "stereo44-128-ms": CodecConfig(
        sample_rate=44_100, n_channels=2, bitrate_bps=128_000,
        use_psy=True, alloc_mode="greedy", stereo_mode="ms",
    ),
    # 8. Mid/side × Huffman VBR (joint reservoir over the pair).
    "vbr-ms": CodecConfig(
        sample_rate=44_100, n_channels=2, bitrate_bps=128_000,
        use_psy=True, use_huffman=True, stereo_mode="ms",
    ),
    # 9. Mid/side × block switching (shared per-pair window state).
    "ms-bs": CodecConfig(
        sample_rate=44_100, n_channels=2, bitrate_bps=128_000,
        use_psy=True, use_block_switch=True, stereo_mode="ms",
    ),
    # 10. The full combo: mid/side × Huffman VBR × block switching.
    "vbr-ms-bs": CodecConfig(
        sample_rate=44_100, n_channels=2, bitrate_bps=128_000,
        use_psy=True, use_huffman=True, use_block_switch=True,
        stereo_mode="ms",
    ),
}
