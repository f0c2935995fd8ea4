"""WAVFile (oracle). SURVEY.md §2 #2.

Block-oriented RIFF/WAVE 16-bit PCM reader/writer over the AudioFile
lifecycle — the reference's serial ReadDataBlock/WriteDataBlock loop.
Chunk parsing is shared with tac.io.wav (same container, not a hot path).
"""

from __future__ import annotations

import numpy as np

from tac.io.wav import read_wav, write_wav
from tac.oracle.audiofile import AudioFile, CodingParams


class WAVFile(AudioFile):
    def ReadFileHeader(self) -> CodingParams:
        x, fs = read_wav(self.filename)
        self._data = x            # [T, C] float64
        self._pos = 0
        cp = CodingParams()
        cp.sampleRate = fs
        cp.nChannels = x.shape[1]
        cp.numSamples = x.shape[0]
        cp.bitsPerSample = 16
        return cp

    def OpenForReading(self) -> CodingParams:
        return self.ReadFileHeader()

    def ReadDataBlock(self, cp: CodingParams):
        """Next nSamplesPerBlock samples per channel, or None at EOF."""
        n = cp.nSamplesPerBlock
        if self._pos >= self._data.shape[0]:
            return None
        blk = self._data[self._pos:self._pos + n]
        self._pos += n
        if blk.shape[0] < n:
            blk = np.concatenate(
                [blk, np.zeros((n - blk.shape[0], blk.shape[1]))])
        return [blk[:, c].copy() for c in range(blk.shape[1])]

    def OpenForWriting(self, cp: CodingParams) -> None:
        self._out = []
        self._cp = cp

    def WriteDataBlock(self, data, cp: CodingParams) -> None:
        self._out.append(np.stack(data, axis=1))

    def Close(self, cp: CodingParams) -> None:
        if hasattr(self, "_out"):
            x = np.concatenate(self._out, axis=0)[:cp.numSamples]
            write_wav(self.filename, x, cp.sampleRate)
