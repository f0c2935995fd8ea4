"""Greedy per-band bit allocation (oracle, serial). SPEC.md §6.

Oracle counterpart of the reference's ``bitalloc.py`` (SURVEY.md §2 #10:
BitAlloc + Uniform/ConstSNR/ConstMNR baselines). The data-dependent Python
``while`` loop is kept on purpose (SURVEY.md §3.1 hot loop #3); the TPU
rebuild expresses the identical decision sequence as a lax.while_loop
(tac/bitalloc.py) — tie-breaks and the DEC table are shared via SPEC.md §10.
"""

from __future__ import annotations

import numpy as np

from tac.bitalloc import DEC_TABLE, MANT_MAX, SMR_GRID


def snap_smr(smr: np.ndarray) -> np.ndarray:
    return np.round(np.asarray(smr, np.float64) * SMR_GRID) / SMR_GRID


def BitAlloc(bitBudget: int, maxMantBits: int, nBands: int,
             nLines: np.ndarray, SMR: np.ndarray) -> np.ndarray:
    """Greedy water-fill with lone-bit cleanup; SMR must be grid-snapped.

    Matches tac.bitalloc.water_fill decision-for-decision: each step is
    either a grant to the neediest affordable band (ties -> lowest index)
    or a freeze of the highest-index lone-1-bit band.
    """
    alloc = np.zeros(nBands, np.int64)
    frozen = np.zeros(nBands, bool)
    remaining = int(bitBudget)
    smr = np.asarray(SMR, np.float64)
    while True:
        best, best_need = -1, None
        for b in range(nBands):
            if frozen[b] or alloc[b] >= maxMantBits or nLines[b] <= 0 \
                    or nLines[b] > remaining:
                continue
            need = smr[b] - DEC_TABLE[alloc[b]]
            if best < 0 or need > best_need:
                best, best_need = b, need
        if best >= 0:
            alloc[best] += 1
            remaining -= int(nLines[best])
            continue
        lone = [b for b in range(nBands) if alloc[b] == 1 and not frozen[b]]
        if not lone:
            break
        hi = lone[-1]
        alloc[hi] = 0
        frozen[hi] = True
        remaining += int(nLines[hi])
    return alloc


def BitAllocUniform(bitBudget: int, maxMantBits: int, nBands: int,
                    nLines: np.ndarray) -> np.ndarray:
    """Uniform = greedy on all-zero SMR (round-robin from band 0)."""
    return BitAlloc(bitBudget, maxMantBits, nBands, nLines,
                    np.zeros(nBands))


def BitAllocConstSNR(bitBudget: int, maxMantBits: int, nBands: int,
                     nLines: np.ndarray, peakSPL: np.ndarray) -> np.ndarray:
    return BitAlloc(bitBudget, maxMantBits, nBands, nLines, snap_smr(peakSPL))


def BitAllocConstMNR(bitBudget: int, maxMantBits: int, nBands: int,
                     nLines: np.ndarray, SMR: np.ndarray) -> np.ndarray:
    return BitAlloc(bitBudget, maxMantBits, nBands, nLines, snap_smr(SMR))


__all__ = ["BitAlloc", "BitAllocUniform", "BitAllocConstSNR",
           "BitAllocConstMNR", "snap_smr", "MANT_MAX"]
